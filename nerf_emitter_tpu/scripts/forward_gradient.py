"""Forward-gradient validation CLI: forward-mode AD vs finite differences.

Re-design of nerfstudio/scripts/forward_gradient.py (:50-208) + the
submodule's fd_util.eval_forward_gradient: render the derivative image of
the full differentiable pipeline along a chosen parameter axis
(x/y/z translation of the SDF, albedo 'rho', roughness 'r') and compare
against central finite differences. The pytest fd tests
(tests/test_renderer.py) cover correctness in CI; this CLI produces the
full derivative IMAGES for visual inspection, like the reference tool.

  python -m nerf_emitter_tpu.scripts.forward_gradient \
      --axis x --resolution 64 --spp 16 --out grads/
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="forward_gradient")
    ap.add_argument("--axis", choices=["x", "y", "z", "rho", "r", "eps"],
                    default="x", help="translation xyz, albedo rho, roughness r, sdf offset eps")
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--fd-delta", type=float, default=2e-3)
    ap.add_argument("--sdf-volume", type=Path, default=None)
    ap.add_argument("--out", type=Path, default=Path("forward_gradient_out"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..cameras.cameras import Cameras
    from ..data.synthetic import look_at
    from ..renderer.emitters import EnvmapEmitter
    from ..renderer.grid3d import grid_sample, sphere_sdf_grid
    from ..renderer.integrator import RenderConfig, render_spp
    from ..renderer.scene import SdfScene
    from ..renderer.sensors import camera_rays_in_render_space
    from ..utils import exr

    res = args.resolution
    env = EnvmapEmitter.create(jnp.ones((16, 32, 3)))
    if args.sdf_volume is not None:
        sdf = jnp.asarray(np.load(args.sdf_volume))
        if sdf.ndim == 3:
            sdf = sdf[..., None]
    else:
        sdf = sphere_sdf_grid(65, radius=0.25)
    scene = SdfScene.create(sdf_res=int(sdf.shape[0]), tex_res=8, envmap=env)
    scene = scene.replace(sdf=sdf)

    c2w = look_at(np.array([0.0, 0.6, 2.2], np.float32), np.zeros(3))
    focal = 0.5 * res / np.tan(0.3)
    cams = Cameras(
        camera_to_worlds=jnp.asarray(c2w[None, :3]),
        fx=jnp.full((1,), focal), fy=jnp.full((1,), focal),
        cx=jnp.full((1,), res / 2), cy=jnp.full((1,), res / 2),
        width=res, height=res,
    )
    o, d = camera_rays_in_render_space(cams, jnp.int32(0), res, res, 1.0)
    cfg = RenderConfig()
    key = jax.random.PRNGKey(0)

    def apply_param(scene: SdfScene, value):
        if args.axis in ("x", "y", "z"):
            ax = "xyz".index(args.axis)
            # translate the SDF by resampling at shifted coordinates
            r_ = scene.sdf.shape[0]
            xs = jnp.linspace(0.0, 1.0, r_)
            gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
            pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
            shift = jnp.zeros(3).at[ax].set(value)
            moved = grid_sample(scene.sdf, pts - shift).reshape(r_, r_, r_, 1)
            return scene.replace(sdf=moved)
        if args.axis == "eps":
            return scene.replace(sdf=scene.sdf + value)
        if args.axis == "rho":
            return scene.replace(albedo=scene.albedo + value)
        return scene.replace(roughness=scene.roughness + value)

    def render_value(value):
        s = apply_param(scene, value)
        out = render_spp(s, o, d, key, args.spp, config=cfg)
        return out["rgb"].reshape(res, res, 3)

    # forward-mode derivative image
    primal, tangent = jax.jvp(render_value, (0.0,), (1.0,))
    # central finite differences at matched seeds
    h = args.fd_delta
    fd = (render_value(h) - render_value(-h)) / (2 * h)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    exr.write_exr(out_dir / "primal.exr", np.asarray(primal))
    exr.write_exr(out_dir / "forward_ad.exr", np.asarray(tangent))
    exr.write_exr(out_dir / "finite_diff.exr", np.asarray(fd))

    t = np.asarray(tangent)
    f = np.asarray(fd)
    denom = np.abs(f).mean() + 1e-6
    rel = float(np.abs(t - f).mean() / denom)
    report = {
        "axis": args.axis,
        "mean_abs_ad": float(np.abs(t).mean()),
        "mean_abs_fd": float(np.abs(f).mean()),
        "mean_rel_error": rel,
    }
    (out_dir / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
