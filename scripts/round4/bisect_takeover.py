"""Bisect the round-3 takeover divergence (VERDICT r3 #1).

Controlled inverse-rendering experiment on the known-good box-recovery
task (tests/test_sdf_optimization.py), extended with the PRODUCTION
recipe's features that the unit test never exercised:

  - per-step redistancing        (prod: redistance_freq=1, test: 10)
  - Sobolev 'hqq' smoothing      (prod: smooth_lam=2.0,    test: off)
  - the mid-run volume upsample  (prod: 64->127 at mi 64,  test: none)
  - render-res doubling          (prod: 64->128 at mi 64,  test: none)
  - the aggregate estimator      (prod: spp16/att8,        test: exact)

The prod divergence starts EXACTLY at the upsample step (e2e_train.log:
improving until 2050, monotonic rise from 2100), so each arm toggles one
factor of the upsample-era recipe. Usage:

  python scripts/round4/bisect_takeover.py --arms prod,no_redist1,... \
      --steps 80 --out /tmp/bisect.json [--platform cpu|tpu]

Writes one JSON with per-arm loss trajectories.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def build_arm(name: str):
    """Arm = dict of overrides on the prod-like base recipe."""
    arms = {
        # full prod-like recipe at mini scale
        "prod": {},
        # single-factor removals
        "no_redist1": {"redistance_freq": 10},
        "no_sobolev": {"smooth_lam": 0.0},
        "no_upsample": {"upsample": False},
        "no_render_up": {"render_up": False},
        "exact_grad": {"spp_attached": 0},
        "lr_low": {"lr": 1e-3},
        "lr_decay_at_up": {"lr_decay_at_up": 0.25},
        "no_curv": {"curvature_mult": 0.0},
        "warp": {"reparam": "warp"},
        # scalar-second-moment Adam (Nicolet et al. 2021): per-coordinate
        # Adam after the Sobolev precond re-amplifies high-freq noise
        "uadam": {"optimizer": "uniform_adam"},
        "uadam_no_up": {"optimizer": "uniform_adam", "upsample": False,
                        "render_up": False},
        # combination arms (after single-factor results): redistance
        # every 10 was the dominant fix, uadam second
        "combo": {"optimizer": "uniform_adam", "redistance_freq": 10},
        "combo_lr": {"optimizer": "uniform_adam", "redistance_freq": 10,
                     "lr_decay_at_up": 0.25},
        "redist5": {"redistance_freq": 5},
    }
    return arms[name]


def run_arm(name: str, steps: int, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_emitter_tpu.cameras.cameras import Cameras
    from nerf_emitter_tpu.pipelines.sdf_optimizer import (
        SdfOptState,
        TakeoverConfig,
        build_sdf_optimizer,
        make_sdf_train_step,
        post_step_host,
    )
    from nerf_emitter_tpu.renderer.emitters import EnvmapEmitter
    from nerf_emitter_tpu.renderer.grid3d import box_sdf_grid
    from nerf_emitter_tpu.renderer.integrator import RenderConfig, render_spp
    from nerf_emitter_tpu.renderer.optimize import (
        SdfOptConfig,
        VariableSpec,
        maybe_upsample,
        validate_params,
    )
    from nerf_emitter_tpu.renderer.scene import SdfScene
    from nerf_emitter_tpu.renderer.sensors import camera_rays_in_render_space
    from nerf_emitter_tpu.renderer.sphere_trace import SphereTraceConfig

    ov = build_arm(name)
    H0 = W0 = 32
    up_step = steps // 3  # upsample a third of the way in (prod: 64/320)
    trace = SphereTraceConfig(max_steps=48, t_max=3.0)
    rconf = RenderConfig(trace=trace, reparam=ov.get("reparam", "soft"))

    def ring_cameras(n=6, radius=1.6, h=H0, w=W0):
        c2ws = []
        for i in range(n):
            th = 2 * np.pi * i / n
            eye = radius * np.array(
                [np.cos(th), 0.35 + 0.1 * (i % 3), np.sin(th)], np.float32
            )
            fwd = -eye / np.linalg.norm(eye)
            right = np.cross(fwd, [0, 1, 0])
            right /= np.linalg.norm(right)
            up = np.cross(right, fwd)
            c2ws.append(
                np.stack([right, up, -fwd, eye], axis=1).astype(np.float32)
            )
        f = jnp.full((n,), 40.0 * (h / 32))
        return Cameras(
            camera_to_worlds=jnp.asarray(np.stack(c2ws)),
            fx=f, fy=f, cx=jnp.full((n,), w / 2), cy=jnp.full((n,), h / 2),
            width=w, height=h,
        )

    env = EnvmapEmitter.create(
        jnp.linspace(0.5, 2.5, 8 * 16 * 3).reshape(8, 16, 3)
    )
    # GT at the FINAL resolution; render GT images at 2x the initial res so
    # both render phases compare against properly-sampled targets
    HG = WG = 64
    cams_hi = ring_cameras(h=HG, w=WG)
    gt_scene = SdfScene.create(sdf_res=65, tex_res=4, envmap=env, init_albedo=0.7)
    gt_scene = gt_scene.replace(sdf=box_sdf_grid(65, half_extent=0.22))
    gts, masks = [], []
    for i in range(len(cams_hi)):
        o, d = camera_rays_in_render_space(cams_hi, jnp.int32(i), HG, WG, 1.0)
        out = render_spp(
            gt_scene, o, d, jax.random.PRNGKey(100 + i), spp=16, config=rconf
        )
        gts.append(out["rgb"].reshape(HG, WG, 3))
        masks.append(out["hit"].reshape(HG, WG, 1).astype(jnp.float32))
    gt_images = jnp.stack(gts)
    gt_masks = jnp.stack(masks)

    lr = ov.get("lr", 3e-3)
    opt_cfg = SdfOptConfig(
        name=f"bisect-{name}",
        bsdf_type=0,
        loss="relative_l1",
        variables=(
            VariableSpec(
                "sdf", lr=lr, clamp=(-1.0, 1.0),
                regularizer_weight=1e-5,
                redistance_freq=ov.get("redistance_freq", 1),
                upsample_iters=(up_step,) if ov.get("upsample", True) else (),
                smooth_lam=ov.get("smooth_lam", 2.0),
                optimizer=ov.get("optimizer", "adam"),
            ),
            VariableSpec("albedo", lr=lr * 1.5, clamp=(0.0, 1.0)),
            VariableSpec("roughness", lr=0.0, clamp=(0.02, 1.0)),
        ),
        render_upsample_iter=(up_step,) if ov.get("render_up", True) else (),
        curvature_mult=ov.get("curvature_mult", 0.005),
        curvature_epsilon=0.025,
    )
    scene0 = SdfScene.create(
        sdf_res=33, tex_res=4, envmap=env, init_albedo=0.5, init_radius=0.28
    )
    tx = build_sdf_optimizer(opt_cfg)
    state = SdfOptState(
        step=jnp.int32(0), scene=scene0, opt_state=tx.init(scene0)
    )

    def make_step(h, w, spp):
        spp_att = ov.get("spp_attached", spp // 2)
        takeover = TakeoverConfig(
            spp=spp, spp_per_batch=max(1, spp // 2),
            spp_attached=min(spp_att, spp) if spp_att else 0,
            image_height=h, image_width=w, scene_scale=1.0,
            laplacian_mult=1e-2,
        )
        return make_sdf_train_step(opt_cfg, takeover, tx, render_config=rconf)

    h = w = H0
    spp = 16
    step_fn = make_step(h, w, spp)
    cam_idx_all = np.arange(len(cams_hi))
    rng = np.random.default_rng(seed)
    traj = []
    lr_scale_applied = False
    for it in range(steps):
        if ov.get("render_up", True) and it == up_step and (h < HG):
            h, w = h * 2, w * 2
            step_fn = make_step(h, w, spp)
        pick = rng.choice(cam_idx_all, size=2, replace=False)
        state, metrics = step_fn(
            state, cams_hi, jnp.asarray(pick, jnp.int32),
            gt_images[pick], gt_masks[pick], jax.random.PRNGKey(seed * 997 + it),
        )
        pre_shape = state.scene.sdf.shape
        state = post_step_host(state, opt_cfg, tx)
        if state.scene.sdf.shape != pre_shape and ov.get("lr_decay_at_up"):
            # re-init the optimizer with decayed sdf LR at the upsample
            decayed = SdfOptConfig(
                name=opt_cfg.name, bsdf_type=0, loss="relative_l1",
                variables=(
                    VariableSpec(
                        "sdf", lr=lr * ov["lr_decay_at_up"], clamp=(-1.0, 1.0),
                        regularizer_weight=1e-5,
                        redistance_freq=ov.get("redistance_freq", 1),
                        upsample_iters=(),
                        smooth_lam=ov.get("smooth_lam", 2.0),
                        optimizer=ov.get("optimizer", "adam"),
                    ),
                    VariableSpec("albedo", lr=lr * 1.5, clamp=(0.0, 1.0)),
                    VariableSpec("roughness", lr=0.0, clamp=(0.02, 1.0)),
                ),
                render_upsample_iter=opt_cfg.render_upsample_iter,
                curvature_mult=opt_cfg.curvature_mult,
                curvature_epsilon=opt_cfg.curvature_epsilon,
            )
            tx2 = build_sdf_optimizer(decayed)
            state = SdfOptState(
                step=state.step, scene=state.scene,
                opt_state=tx2.init(state.scene),
                mean_params=state.mean_params, mean_count=state.mean_count,
            )
            tx = tx2
            step_fn = make_step(h, w, spp)
            lr_scale_applied = True
        traj.append(
            {
                "step": it,
                "view": float(metrics["view_loss"]),
                "mask": float(metrics["mask_loss"]),
                "curv": float(metrics["curvature"]),
                "lap": float(metrics["laplacian"]),
                "gnorm_sdf": float(metrics["gnorm_sdf"]),
            }
        )
        if it % 10 == 0 or it == steps - 1:
            print(
                f"[{name}] step {it}: view={traj[-1]['view']:.4f} "
                f"mask={traj[-1]['mask']:.4f} curv={traj[-1]['curv']:.2f} "
                f"lap={traj[-1]['lap']:.4f}",
                flush=True,
            )

    # final geometry error vs GT box (both at their native res — compare on
    # a common 65^3 lattice)
    import jax.numpy as jnp2
    from nerf_emitter_tpu.renderer.grid3d import upsample_grid

    pred = state.scene.sdf
    if pred.shape[0] != 65:
        pred = upsample_grid(pred, 65)
    sdf_mae = float(jnp2.mean(jnp2.abs(pred - gt_scene.sdf)))
    n = len(traj)
    q = max(1, n // 8)
    head = float(np.mean([t["view"] for t in traj[up_step - q:up_step]]))
    tail = float(np.mean([t["view"] for t in traj[-q:]]))
    summary = {
        "arm": name,
        "view_pre_upsample": head,
        "view_final": tail,
        "diverged": tail > 1.5 * head,
        "sdf_mae_vs_gt": sdf_mae,
        "final_res": int(state.scene.sdf.shape[0]),
        "lr_decay_applied": lr_scale_applied,
    }
    print(f"[{name}] SUMMARY {json.dumps(summary)}", flush=True)
    return {"summary": summary, "traj": traj}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="prod,no_redist1,no_sobolev,no_upsample")
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--out", default="/tmp/bisect.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    results = {}
    for arm in args.arms.split(","):
        results[arm] = run_arm(arm.strip(), args.steps)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
