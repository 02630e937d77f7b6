"""Render CLI: novel views, relighting videos, envmap probes.

Re-design of nerfstudio/scripts/render.py (833 LoC of subcommands):
- `eval`: render the eval split via the full pipeline (SDF + NeRF emitter)
  to EXR/PNG (reference EvalRender, :562-670)
- `rotate-light`: relight frames while rotating the emitter about the
  object (reference RotateLightRender, :673-713) — here the rotation is a
  Rotater transform applied to the emitter-query directions
- `envmap`: render the NeRF into an equirect environment probe at a point
  (the spherical_sensor path used for envmap export)
- `camera-path`: render an interpolated orbit of novel views

  python -m nerf_emitter_tpu.scripts.render eval \
      --load-config outputs/lego/sdf-nerfacto/config.json --spp 64
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _load(args):
    from ..configs.cli import load_config
    from ..engine.trainer import Trainer

    config = load_config(args.load_config)
    trainer = Trainer(config)
    trainer.setup()
    try:
        trainer.load_checkpoint(getattr(args, "checkpoint_step", None))
    except FileNotFoundError:
        print("warning: no checkpoint found; rendering fresh init")
    return trainer


def _save_image(path: Path, rgb: np.ndarray, is_hdr: bool) -> np.ndarray:
    """Write EXR (HDR) or PNG; returns the sRGB-tonemapped uint8 frame
    either way (for video muxing)."""
    path.parent.mkdir(parents=True, exist_ok=True)
    from ..utils.math import linear_to_srgb

    frame = (np.asarray(linear_to_srgb(jnp.asarray(rgb))) * 255).astype(np.uint8)
    if is_hdr:
        from ..utils import exr

        exr.write_exr(path.with_suffix(".exr"), rgb)
    else:
        from PIL import Image

        Image.fromarray(frame).save(path.with_suffix(".png"))
    return frame


def _maybe_mux(args, frames: list, out_dir: Path, name: str):
    if getattr(args, "video", False) and frames:
        from ..utils.video import write_mjpeg_avi

        p = write_mjpeg_avi(out_dir / f"{name}.avi", frames, fps=args.fps)
        print(f"muxed {len(frames)} frames -> {p}")


def cmd_eval(args):
    trainer = _load(args)
    ds = trainer.eval_dataset or trainer.dataset
    key = jax.random.PRNGKey(0)
    out_dir = Path(args.output_path)
    for i in range(ds.images.shape[0]):
        key, k = jax.random.split(key)
        out = trainer.pipeline.render_camera_outputs(
            ds, i, k, spp=args.spp, spp_per_batch=args.spp_per_batch,
            denoise=args.denoise,
        )
        _save_image(out_dir / f"render_{i:04d}", np.asarray(out["rgb"]), ds.is_hdr)
        _save_image(out_dir / f"gt_{i:04d}", np.asarray(ds.images[i]), ds.is_hdr)
    print(f"wrote {ds.images.shape[0]} renders to {out_dir}")


def cmd_rotate_light(args):
    """Relight video: keep camera fixed, rotate the emitter around +y
    (reference set_light_axis_angle, mitsuba_sdf.py:1230-1233)."""
    trainer = _load(args)
    pipeline = trainer.pipeline
    assert pipeline.sdf_state is not None, "rotate-light needs an SDF checkpoint"
    ds = trainer.dataset
    cams = ds.cameras
    from ..renderer.integrator import render_spp
    from ..renderer.sensors import camera_rays_in_render_space

    base_emitter = pipeline._emitter_fn_of(pipeline.nerf_state.params)
    out_dir = Path(args.output_path)
    key = jax.random.PRNGKey(0)
    frames: list = []
    for fi in range(args.n_frames):
        angle = 2.0 * np.pi * fi / args.n_frames
        c, s = np.cos(angle), np.sin(angle)
        rot = jnp.asarray(
            [[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], jnp.float32
        )
        center = jnp.asarray([0.5, 0.5, 0.5])

        def rotated_emitter(x, d, rot=rot):
            # rotate emitter-query rays about the object center
            x_r = (x - center) @ rot.T + center
            return base_emitter(x_r, d @ rot.T)

        o, d = camera_rays_in_render_space(
            cams, jnp.int32(args.camera_index), cams.height, cams.width,
            pipeline.config.scene_scale,
        )
        key, k = jax.random.split(key)
        out = render_spp(
            pipeline.sdf_state.scene, o, d, k, args.spp,
            emitter_fn=rotated_emitter, config=pipeline.render_config,
        )
        rgb = np.asarray(out["rgb"]).reshape(cams.height, cams.width, 3)
        if args.denoise == "learned":
            from ..renderer.learned_denoise import apply_denoiser

            if getattr(pipeline, "_denoiser_params", None) is None:
                pipeline.fit_scene_denoiser(jax.random.PRNGKey(17), ds)
            rgb = np.asarray(apply_denoiser(
                pipeline._denoiser_params, jnp.asarray(rgb),
                out["normal"].reshape(cams.height, cams.width, 3),
                out["depth"].reshape(cams.height, cams.width, 1),
                pipeline._denoiser_config,
            ))
        elif args.denoise:
            from ..renderer.spp_schedule import bilateral_denoise

            rgb = np.asarray(bilateral_denoise(
                jnp.asarray(rgb),
                normal=out["normal"].reshape(cams.height, cams.width, 3),
                depth=out["depth"].reshape(cams.height, cams.width, 1),
            ))
        frames.append(_save_image(out_dir / f"frame_{fi:04d}", rgb, ds.is_hdr))
    print(f"wrote {args.n_frames} relit frames to {out_dir}")
    _maybe_mux(args, frames, out_dir, "rotate_light")


def cmd_envmap(args):
    """Render the NeRF into an equirect probe (spherical sensor)."""
    trainer = _load(args)
    pipeline = trainer.pipeline
    from ..cameras.cameras import make_spherical_rig
    from ..engine.train_loop import make_render_fn

    rig = make_spherical_rig(
        jnp.asarray([args.cx, args.cy, args.cz]), width=args.width,
        height=args.height,
    )
    render = make_render_fn(pipeline.model, pipeline.train_config, chunk=4096)
    out = render(
        pipeline.nerf_state.params, rig, jnp.int32(0), args.height, args.width
    )
    _save_image(Path(args.output_path) / "envmap", np.asarray(out["rgb"]), True)
    print("wrote envmap probe")


def cmd_camera_path(args):
    """Render a camera path: either a viewer-authored keyframe JSON
    (--camera-path-file, the reference's viewer camera-path workflow —
    keyframes slerped/lerped into n_frames poses) or the default orbit of
    the scene center."""
    trainer = _load(args)
    ds = trainer.dataset
    from ..cameras.cameras import Cameras
    from ..data.synthetic import look_at

    if getattr(args, "camera_path_file", None):
        import json

        with open(args.camera_path_file) as f:
            spec = json.load(f)
        keys = spec["keyframes"]
        n = int(spec.get("n_frames", args.n_frames))
        kf_c2w = [np.asarray(k["c2w"], np.float32) for k in keys]
        kf_fov = [float(k.get("fov_deg", 40.0)) for k in keys]
        c2ws, fovs = [], []
        if len(keys) == 1:
            c2ws, fovs = [kf_c2w[0]] * n, [kf_fov[0]] * n
        else:
            for i in range(n):
                u = i / max(n - 1, 1) * (len(keys) - 1)
                a = min(int(u), len(keys) - 2)
                t = u - a
                rot = _slerp(kf_c2w[a][:, :3], kf_c2w[a + 1][:, :3], t)
                pos = (1 - t) * kf_c2w[a][:, 3] + t * kf_c2w[a + 1][:, 3]
                c2ws.append(
                    np.concatenate([rot, pos[:, None]], axis=1).astype(
                        np.float32
                    )
                )
                fovs.append((1 - t) * kf_fov[a] + t * kf_fov[a + 1])
        w, h = ds.cameras.width, ds.cameras.height
        f = [0.5 * w / np.tan(np.deg2rad(fv) / 2.0) for fv in fovs]
        cams = Cameras(
            camera_to_worlds=jnp.asarray(np.stack(c2ws)),
            fx=jnp.asarray(f, jnp.float32), fy=jnp.asarray(f, jnp.float32),
            cx=jnp.full((n,), w / 2.0), cy=jnp.full((n,), h / 2.0),
            width=w, height=h,
        )
        _render_path(trainer, ds, cams, args, "path")
        return

    r = float(np.linalg.norm(np.asarray(ds.cameras.camera_to_worlds[0, :3, 3])))
    c2ws = []
    for i in range(args.n_frames):
        th = 2 * np.pi * i / args.n_frames
        eye = r * np.array([np.cos(th), 0.4, np.sin(th)], np.float32)
        c2ws.append(look_at(eye, np.zeros(3))[:3])
    n = args.n_frames
    cams = Cameras(
        camera_to_worlds=jnp.asarray(np.stack(c2ws)),
        fx=jnp.full((n,), float(ds.cameras.fx[0])),
        fy=jnp.full((n,), float(ds.cameras.fy[0])),
        cx=jnp.full((n,), float(ds.cameras.cx[0])),
        cy=jnp.full((n,), float(ds.cameras.cy[0])),
        width=ds.cameras.width, height=ds.cameras.height,
    )
    _render_path(trainer, ds, cams, args, "path")


def _render_path(trainer, ds, cams, args, tag: str):
    """Render every camera in `cams` via the pipeline serving path and
    write frames (+ optional AVI)."""
    from ..data.datamanager import ImageDataset

    path_ds = ImageDataset(cameras=cams, images=ds.images[:1], is_hdr=ds.is_hdr)
    key = jax.random.PRNGKey(0)
    out_dir = Path(args.output_path)
    frames: list = []
    n = int(cams.camera_to_worlds.shape[0])
    for i in range(n):
        key, k = jax.random.split(key)
        out = trainer.pipeline.render_camera_outputs(
            path_ds, i, k, spp=args.spp, spp_per_batch=args.spp_per_batch,
            denoise=args.denoise,
        )
        rgb = np.asarray(out["rgb"])
        frames.append(_save_image(out_dir / f"{tag}_{i:04d}", rgb, ds.is_hdr))
    print(f"wrote {n} {tag} frames to {out_dir}")
    _maybe_mux(args, frames, out_dir, tag)


def _slerp(r0: np.ndarray, r1: np.ndarray, t: float) -> np.ndarray:
    """Spherical interpolation of two rotation matrices via quaternions."""
    def to_quat(m):
        w = np.sqrt(max(0.0, 1.0 + m[0, 0] + m[1, 1] + m[2, 2])) / 2.0
        if w > 1e-6:
            return np.array([w, (m[2, 1] - m[1, 2]) / (4 * w),
                             (m[0, 2] - m[2, 0]) / (4 * w),
                             (m[1, 0] - m[0, 1]) / (4 * w)])
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1e-12, 1.0 + m[i, i] - m[j, j] - m[k, k])) * 2.0
        q = np.zeros(4)
        q[0] = (m[k, j] - m[j, k]) / s
        q[1 + i] = s / 4.0
        q[1 + j] = (m[j, i] + m[i, j]) / s
        q[1 + k] = (m[k, i] + m[i, k]) / s
        return q

    q0, q1 = to_quat(r0), to_quat(r1)
    if np.dot(q0, q1) < 0:
        q1 = -q1
    d = np.clip(np.dot(q0, q1), -1.0, 1.0)
    th = np.arccos(d)
    if th < 1e-5:
        q = (1 - t) * q0 + t * q1
    else:
        q = (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def cmd_interpolate(args):
    """Smooth path through the dataset cameras (reference render.py
    interpolate subcommand, render.py:808-818): slerp rotations + lerp
    positions between consecutive training views."""
    trainer = _load(args)
    ds = trainer.eval_dataset or trainer.dataset
    from ..cameras.cameras import Cameras

    src = np.asarray(ds.cameras.camera_to_worlds)[:, :3]
    n_src = src.shape[0]
    per = max(1, args.n_frames // max(1, n_src - 1))
    c2ws = []
    for i in range(n_src - 1):
        for j in range(per):
            t = j / per
            m = np.eye(3, 4, dtype=np.float32)
            m[:3, :3] = _slerp(src[i, :3, :3], src[i + 1, :3, :3], t)
            m[:3, 3] = (1 - t) * src[i, :3, 3] + t * src[i + 1, :3, 3]
            c2ws.append(m)
    n = len(c2ws)
    cams = Cameras(
        camera_to_worlds=jnp.asarray(np.stack(c2ws)),
        fx=jnp.full((n,), float(ds.cameras.fx[0])),
        fy=jnp.full((n,), float(ds.cameras.fy[0])),
        cx=jnp.full((n,), float(ds.cameras.cx[0])),
        cy=jnp.full((n,), float(ds.cameras.cy[0])),
        width=ds.cameras.width, height=ds.cameras.height,
    )
    _render_path(trainer, ds, cams, args, "interp")


def cmd_spiral(args):
    """Spiral around the first dataset camera (reference render.py spiral
    subcommand): the view orbits the look-at point with a slow vertical
    oscillation and radius sweep."""
    trainer = _load(args)
    ds = trainer.eval_dataset or trainer.dataset
    from ..cameras.cameras import Cameras
    from ..data.synthetic import look_at

    c0 = np.asarray(ds.cameras.camera_to_worlds[0])[:3]
    eye0 = c0[:3, 3]
    r0 = float(np.linalg.norm(eye0))
    c2ws = []
    for i in range(args.n_frames):
        t = i / max(1, args.n_frames)
        th = np.arctan2(eye0[2], eye0[0]) + 2 * np.pi * t
        rad = r0 * (1.0 + 0.15 * np.sin(4 * np.pi * t))
        y = eye0[1] + 0.25 * r0 * np.sin(2 * np.pi * t)
        eye = np.array([rad * np.cos(th), y, rad * np.sin(th)], np.float32)
        c2ws.append(look_at(eye, np.zeros(3))[:3])
    n = args.n_frames
    cams = Cameras(
        camera_to_worlds=jnp.asarray(np.stack(c2ws)),
        fx=jnp.full((n,), float(ds.cameras.fx[0])),
        fy=jnp.full((n,), float(ds.cameras.fy[0])),
        cx=jnp.full((n,), float(ds.cameras.cx[0])),
        cy=jnp.full((n,), float(ds.cameras.cy[0])),
        width=ds.cameras.width, height=ds.cameras.height,
    )
    _render_path(trainer, ds, cams, args, "spiral")


def cmd_stroke(args):
    """Stroke -> camera path (reference StrokeToCameraXml,
    render.py:716-805): unproject a drawn pixel stroke through the rendered
    depth into 3D, then emit a camera path whose sensors travel along the
    stroke (for spherical-sensor light probing along a curve)."""
    import json

    trainer = _load(args)
    pipeline = trainer.pipeline
    ds = trainer.dataset
    cams = ds.cameras
    with open(args.stroke_path) as f:
        stroke = json.load(f)  # {"camera_index": i, "pixels": [[y,x], ...]}
    ci = int(stroke.get("camera_index", args.camera_index))

    out = pipeline.render_camera_outputs(ds, ci, jax.random.PRNGKey(0), spp=args.spp)
    depth = np.asarray(out["depth"]).reshape(cams.height, cams.width)

    pix = jnp.asarray(stroke["pixels"], jnp.int32)
    bundle = cams.generate_rays(
        jnp.full((pix.shape[0],), ci, jnp.int32), pix
    )
    d_at = depth[np.asarray(pix[:, 0]), np.asarray(pix[:, 1])]
    if pipeline.sdf_state is not None:
        # SDF depth is in render space; convert to world distance
        d_at = d_at * 2.0 * pipeline.config.scene_scale
    pts = np.asarray(bundle.origins) + np.asarray(bundle.directions) * d_at[:, None]

    path = {
        "points": pts.tolist(),
        "camera_path": [
            {"position": p.tolist(), "look_at": [0.0, 0.0, 0.0]} for p in pts
        ],
    }
    out_path = Path(args.output_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path.with_suffix(".json"), "w") as f:
        json.dump(path, f, indent=1)
    print(f"stroke unprojected to {len(pts)} points -> {out_path.with_suffix('.json')}")


def main(argv=None):
    from ..utils.jit_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    ap = argparse.ArgumentParser(prog="render")
    subs = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in [
        ("eval", cmd_eval),
        ("rotate-light", cmd_rotate_light),
        ("envmap", cmd_envmap),
        ("camera-path", cmd_camera_path),
        ("interpolate", cmd_interpolate),
        ("spiral", cmd_spiral),
        ("stroke", cmd_stroke),
    ]:
        sub = subs.add_parser(name)
        sub.add_argument("--load-config", type=Path, required=True)
        sub.add_argument("--output-path", type=Path, default=Path("renders"))
        sub.add_argument("--spp", type=int, default=64)
        sub.add_argument("--checkpoint-step", type=int, default=None)
        sub.add_argument("--camera-index", type=int, default=0)
        sub.add_argument("--n-frames", type=int, default=60)
        sub.add_argument("--width", type=int, default=1024)
        sub.add_argument("--height", type=int, default=512)
        sub.add_argument("--cx", type=float, default=0.5)
        sub.add_argument("--cy", type=float, default=0.5)
        sub.add_argument("--cz", type=float, default=0.5)
        sub.add_argument("--stroke-path", type=Path, default=Path("stroke.json"))
        sub.add_argument("--camera-path-file", type=Path, default=None,
                         help="viewer-exported keyframe JSON to render")
        sub.add_argument("--video", action="store_true",
                         help="also mux frames into an MJPEG AVI")
        sub.add_argument("--fps", type=int, default=24)
        sub.add_argument("--spp-per-batch", type=int, default=64,
                         help="host-side spp batch size (divide_spp)")
        sub.add_argument("--denoise", action="store_true",
                         help="denoise final renders (OptiX stand-in)")
        sub.add_argument("--denoise-mode", choices=("bilateral", "learned"),
                         default="bilateral",
                         help="bilateral = joint bilateral filter; learned"
                              " = per-scene KPCN-lite kernel prediction,"
                              " noise2noise-fitted on first use")
        sub.set_defaults(fn=fn)
    args = ap.parse_args(argv)
    # the pipeline takes denoise=False|'bilateral'|'learned'
    if getattr(args, "denoise", False):
        args.denoise = args.denoise_mode
    args.fn(args)


if __name__ == "__main__":
    main()
