"""Synthetic dataset generator: render an SDF object inside an HDR
environment with the framework's own renderer.

Re-design of nerfstudio/scripts/gen_data.py (:45-385): the reference
Mitsuba-renders an object into an environment scene (path/direct
integrator, spp 16384), over random or spiral camera paths with optional
per-frame light rotations, exporting transforms.json + envmap GT. Here the
direct-illumination SDF renderer produces the images; objects come from an
SDF volume (.npy), a built-in primitive, or a mesh converted via
convert_mesh_to_sdf.

  python -m nerf_emitter_tpu.scripts.gen_data \
      --object sphere --envmap env.exr --n-views 100 --out data/sphere
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _procedural_envmap(h=256, w=512) -> np.ndarray:
    """A default HDR environment: sun lobe + sky gradient."""
    ys = (np.arange(h) + 0.5) / h * np.pi
    xs = ((np.arange(w) + 0.5) / w - 0.5) * 2 * np.pi
    theta, phi = np.meshgrid(ys, xs, indexing="ij")
    d = np.stack(
        [np.sin(theta) * np.sin(phi), np.cos(theta), -np.sin(theta) * np.cos(phi)],
        -1,
    )
    sun = np.array([0.4, 0.8, 0.45]) / np.linalg.norm([0.4, 0.8, 0.45])
    cos = np.clip(d @ sun, 0, None)
    lobe = 20.0 * cos**64
    sky = 0.4 + 0.6 * np.clip(d[..., 1], 0, None)
    img = np.stack(
        [lobe + 0.9 * sky, lobe * 0.95 + 0.95 * sky, lobe * 0.85 + 1.1 * sky], -1
    )
    return img.astype(np.float32)


def main(argv=None):
    from ..utils.jit_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    ap = argparse.ArgumentParser(prog="gen_data")
    ap.add_argument("--object", type=str, default="sphere",
                    help="'sphere' | 'box' | 'composite' | path to .npy SDF volume")
    ap.add_argument("--albedo", choices=["const", "bands"], default="const",
                    help="GT albedo: constant 0.6 or spatially-varying bands")
    ap.add_argument("--envmap", type=Path, default=None)
    ap.add_argument("--n-views", type=int, default=100)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--radius", type=float, default=2.4)
    ap.add_argument("--n-rotations", type=int, default=1,
                    help="turntable light rotations (per-frame rotation tags)")
    ap.add_argument("--path-type", choices=["random", "spiral"], default="random")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true",
                    help="skip views whose EXR already exists (crash resume)")
    ap.add_argument("--out", type=Path, required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..cameras.cameras import Cameras
    from ..data.synthetic import look_at
    from ..renderer.emitters import EnvmapEmitter
    from ..renderer.grid3d import box_sdf_grid, sphere_sdf_grid
    from ..renderer.integrator import RenderConfig, render_spp
    from ..renderer.scene import SdfScene
    from ..renderer.sensors import camera_rays_in_render_space
    from ..utils import exr

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    # environment
    if args.envmap is not None:
        img = (
            np.load(args.envmap)
            if args.envmap.suffix == ".npy"
            else exr.read_exr(args.envmap)
        )
    else:
        img = _procedural_envmap()
    env = EnvmapEmitter.create(jnp.asarray(img[..., :3]))
    exr.write_exr(out / "env.exr", img[..., :3])

    # turntable light rotations: rotating the light about +y by angle a is
    # a horizontal roll of the equirect envmap (the reference gen_data
    # renders per-rotation rotated scenes + env_{rot}.exr GT)
    rot_angles = [i * 360.0 / args.n_rotations for i in range(args.n_rotations)]
    rot_envs = []
    for a in rot_angles:
        shift = int(round(a / 360.0 * img.shape[1])) % img.shape[1]
        rolled = np.roll(img[..., :3], shift, axis=1)
        rot_envs.append(EnvmapEmitter.create(jnp.asarray(rolled)))
        if args.n_rotations > 1:
            exr.write_exr(out / f"env_{int(a)}.exr", rolled)

    # object
    if args.object == "sphere":
        sdf = sphere_sdf_grid(129, radius=0.22)
    elif args.object == "box":
        sdf = box_sdf_grid(129, half_extent=0.18)
    elif args.object == "composite":
        from ..renderer.grid3d import composite_sdf_grid

        sdf = composite_sdf_grid(129)
    else:
        sdf = jnp.asarray(np.load(args.object))
        if sdf.ndim == 3:
            sdf = sdf[..., None]
    scene = SdfScene.create(sdf_res=int(sdf.shape[0]), tex_res=32, envmap=env,
                            init_albedo=0.6)
    scene = scene.replace(sdf=sdf)
    if args.albedo == "bands":
        # spatially-varying GT albedo (the reference's textured .vol
        # objects): color bands along y, checker-modulated in x/z, so
        # material recovery is a real task rather than a constant fit
        t = scene.albedo.shape[0]
        u = (np.arange(t) + 0.5) / t
        bx, by, bz = np.meshgrid(u, u, u, indexing="ij")
        colors = np.array(
            [[0.70, 0.22, 0.18], [0.18, 0.52, 0.70], [0.72, 0.62, 0.22]],
            np.float32,
        )
        band = np.minimum((by * 3).astype(np.int64), 2)
        alb = colors[band]
        checker = ((bx * 6).astype(np.int64) + (bz * 6).astype(np.int64)) % 2
        alb = alb * (0.75 + 0.25 * checker)[..., None]
        scene = scene.replace(albedo=jnp.asarray(alb, jnp.float32))

    # GT geometry/material alongside the dataset: chamfer evaluation
    # (scripts/chamfer.py) extracts the GT mesh from gt_sdf.npy via the
    # exporter (the reference evaluates against the source mesh)
    np.save(out / "gt_sdf.npy", np.asarray(scene.sdf))
    np.save(out / "gt_albedo.npy", np.asarray(scene.albedo))

    scene_scale = 1.0  # world [-1,1]; cameras scaled by dataparser later
    focal = 0.5 * args.width / np.tan(0.35)
    h, w = args.height, args.width
    key = jax.random.PRNGKey(args.seed)

    # all cameras up front -> ONE jitted render reused per view (eager
    # dispatch per view is pathological over a remote device link).
    #
    # Turntable convention (matches the training-side Rotater): the stored
    # c2w is the WORLD (light)-frame capture pose; the object is rotated by
    # R(angle) about +y in image i. Rendering happens in the object-
    # CANONICAL frame, so the render camera is R(-angle)·c2w and the env is
    # the world envmap seen from the canonical frame (yaw roll by +angle).
    def yaw(a_deg: float) -> np.ndarray:
        a = np.deg2rad(a_deg)
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)

    c2ws, c2ws_render, frame_rots = [], [], []
    for i in range(args.n_views):
        if args.path_type == "spiral":
            th = 4 * np.pi * i / args.n_views
            ph = 0.15 + 0.9 * i / args.n_views
        else:
            th = rng.uniform(0, 2 * np.pi)
            ph = rng.uniform(0.1, 1.2)
        eye = args.radius * np.array(
            [np.cos(th) * np.cos(ph), np.sin(ph), np.sin(th) * np.cos(ph)]
        )
        c2w = look_at(eye.astype(np.float32), np.zeros(3))
        rot_idx = i % args.n_rotations
        frame_rots.append(rot_idx)
        r_inv = yaw(-rot_angles[rot_idx])
        c2w_render = c2w.copy()
        c2w_render[:3, :4] = r_inv @ c2w[:3, :4]
        c2ws.append(c2w)
        c2ws_render.append(c2w_render)
    n = args.n_views
    cams = Cameras(
        camera_to_worlds=jnp.asarray(np.stack(c2ws_render))[:, :3],
        fx=jnp.full((n,), focal), fy=jnp.full((n,), focal),
        cx=jnp.full((n,), w / 2), cy=jnp.full((n,), h / 2),
        width=w, height=h,
    )

    # spp is split into fixed-size device programs and averaged host-side
    # (one long 256-spp program is a single multi-second dispatch — hostile
    # to remote-device links; this is the reference's render_aggregate
    # batching for the primal-only case)
    # small per-dispatch spp: one multi-second device program is hostile
    # to remote-device links (the axon tunnel kills long executions)
    spp_call = min(args.spp, 8)
    n_calls = max(1, args.spp // spp_call)

    @jax.jit
    def render_view_jit(sc, cam_idx, k):
        o, d = camera_rays_in_render_space(cams, cam_idx, h, w, scene_scale)
        # primal-only GT render: the warp reparameterization is primal-
        # identical, so 'soft' skips its 3x trace cost and its minutes-long
        # jvp compile entirely
        res = render_spp(sc, o, d, k, spp_call,
                         config=RenderConfig(reparam="soft"), remat=False)
        return res["rgb"], res["hit"]

    frames = []
    for i in range(n):
        name = f"r_{i:04d}.exr"
        if args.resume and (out / name).exists():
            # crash/restart resume: keys still advance so re-rendered and
            # skipped views come out identical to a fresh run
            for _ in range(n_calls):
                key, _k = jax.random.split(key)
            frames.append({
                "file_path": name,
                "transform_matrix": c2ws[i].tolist(),
                "rotation": int(rot_angles[frame_rots[i]]),
            })
            continue
        from ..utils import capture_lock

        capture_lock.checkpoint()  # yield to a driver capture window
        sc = scene.replace(envmap=rot_envs[frame_rots[i]])
        acc = None
        for _ in range(n_calls):
            key, k = jax.random.split(key)
            rgb_j, hit_j = render_view_jit(sc, jnp.int32(i), k)
            acc = rgb_j if acc is None else acc + rgb_j
        rgb = np.asarray(acc / n_calls).reshape(h, w, 3)
        mask = np.asarray(hit_j).reshape(h, w, 1).astype(np.float32)
        exr.write_exr(out / name, np.concatenate([rgb, mask], -1))
        frames.append(
            {
                "file_path": name,
                "transform_matrix": c2ws[i].tolist(),
                # tag = turntable angle in degrees (reference convention)
                "rotation": int(rot_angles[frame_rots[i]]),
            }
        )
        if i % 10 == 0:
            print(f"rendered {i}/{n}", flush=True)

    # object box (world coords): true extent of the SDF's interior + 20%
    # pad. Declared in the dataset so training's carve-out/TSDF box always
    # CONTAINS the object (a too-small configured box breaks both).
    sdf_np = np.asarray(sdf[..., 0])
    res_sdf = sdf_np.shape[0]
    neg = np.argwhere(sdf_np < 0)
    if len(neg):
        lo_u = neg.min(axis=0) / (res_sdf - 1)
        hi_u = neg.max(axis=0) / (res_sdf - 1)
        c_u = (lo_u + hi_u) / 2.0
        half_u = (hi_u - lo_u) / 2.0 * 1.2 + 1.0 / res_sdf
        # unit [0,1] -> world [-s, s]
        lo_w = ((c_u - half_u) * 2.0 - 1.0) * scene_scale
        hi_w = ((c_u + half_u) * 2.0 - 1.0) * scene_scale
        object_aabb = [lo_w.tolist(), hi_w.tolist()]
    else:
        object_aabb = [[-0.3] * 3, [0.3] * 3]

    meta = {
        "fl_x": focal, "fl_y": focal, "w": w, "h": h,
        "cx": w / 2, "cy": h / 2,
        "envmap": "env.exr",
        "object_aabb": object_aabb,
        "frames": frames,
    }
    with open(out / "transforms.json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"dataset written to {out}")


if __name__ == "__main__":
    main()
