"""End-to-end SDF inverse rendering test (the sdf-gt-envmap baseline):
recover a box from a sphere init under a known envmap, with GT images
rendered by the same renderer (self-consistent inverse problem)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_emitter_tpu.cameras.cameras import Cameras
from nerf_emitter_tpu.pipelines.sdf_optimizer import (
    SdfOptState,
    TakeoverConfig,
    build_sdf_optimizer,
    make_sdf_train_step,
)
from nerf_emitter_tpu.renderer.emitters import EnvmapEmitter
from nerf_emitter_tpu.renderer.grid3d import box_sdf_grid, sphere_sdf_grid
from nerf_emitter_tpu.renderer.integrator import RenderConfig, render_spp
from nerf_emitter_tpu.renderer.optimize import (
    SdfOptConfig,
    VariableSpec,
    eikonal_residual,
    get_opt_config,
    laplacian_reg,
    redistance,
    validate_params,
)
from nerf_emitter_tpu.renderer.scene import SdfScene
from nerf_emitter_tpu.renderer.sensors import camera_rays_in_render_space
from nerf_emitter_tpu.renderer.sphere_trace import SphereTraceConfig

H = W = 32
TRACE = SphereTraceConfig(max_steps=48, t_max=3.0)
# soft reparam: at this test's spp=4 the warp estimator's variance stalls
# convergence (TPU A/B: last5/first 0.34 soft vs 0.67 warp); the warp's
# gradient CORRECTNESS is covered by tests/test_reparam.py instead.
RCONF = RenderConfig(trace=TRACE, reparam="soft")
SCALE = 1.0  # world [-1,1] -> unit cube


def _ring_cameras(n=4, radius=1.6):
    c2ws = []
    for i in range(n):
        th = 2 * np.pi * i / n
        eye = radius * np.array([np.cos(th), 0.35, np.sin(th)], np.float32)
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 1, 0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2ws.append(np.stack([right, up, -fwd, eye], axis=1).astype(np.float32))
    f = jnp.full((n,), 40.0)
    return Cameras(
        camera_to_worlds=jnp.asarray(np.stack(c2ws)),
        fx=f, fy=f, cx=jnp.full((n,), W / 2), cy=jnp.full((n,), H / 2),
        width=W, height=H,
    )


def test_redistance_recovers_sdf():
    # squash a sphere SDF by 3x, redistance should restore |grad|=1
    sdf = sphere_sdf_grid(33, radius=0.3) * (1.0 / 3.0)
    bad = eikonal_residual(sdf)
    fixed = redistance(sdf, n_iters=60)
    good = eikonal_residual(fixed)
    assert float(good) < float(bad) * 0.5
    # surface stays put: value near surface point ~0
    from nerf_emitter_tpu.renderer.grid3d import sdf_eval

    p = jnp.array([[0.5, 0.5, 0.8]])
    np.testing.assert_allclose(sdf_eval(fixed, p), 0.0, atol=0.02)


def test_laplacian_reg_flat_zero():
    flat = jnp.zeros((9, 9, 9, 1))
    assert float(laplacian_reg(flat)) == 0.0
    bumpy = flat.at[4, 4, 4, 0].set(1.0)
    assert float(laplacian_reg(bumpy)) > 0.0


def test_opt_config_registry():
    cfg = get_opt_config("diffuse-12-relativel1-hqq")
    assert cfg.loss == "relative_l1"
    names = [v.name for v in cfg.variables]
    assert set(names) == {"sdf", "albedo", "roughness"}


def test_validate_params_clamps():
    cfg = get_opt_config("diffuse-12-relativel1-hqq")
    scene = SdfScene.create(sdf_res=17, tex_res=4)
    scene = scene.replace(albedo=scene.albedo + 5.0)
    out = validate_params(scene, cfg, step=1)
    assert float(out.albedo.max()) <= 1.0


def test_sdf_inverse_rendering_recovers_shape():
    cams = _ring_cameras()
    env = EnvmapEmitter.create(jnp.ones((8, 16, 3)) * 1.5)

    # GT: box scene; init: sphere
    gt_scene = SdfScene.create(sdf_res=33, tex_res=4, envmap=env, init_albedo=0.7)
    gt_scene = gt_scene.replace(sdf=box_sdf_grid(33, half_extent=0.22))

    gts, masks = [], []
    for i in range(len(cams)):
        o, d = camera_rays_in_render_space(cams, jnp.int32(i), H, W, SCALE)
        out = render_spp(gt_scene, o, d, jax.random.PRNGKey(100 + i), spp=8, config=RCONF)
        gts.append(out["rgb"].reshape(H, W, 3))
        masks.append(out["hit"].reshape(H, W, 1).astype(jnp.float32))
    gt_images = jnp.stack(gts)
    gt_masks = jnp.stack(masks)

    opt_cfg = SdfOptConfig(
        name="test",
        bsdf_type=0,
        loss="relative_l1",
        variables=(
            VariableSpec("sdf", lr=3e-3, redistance_freq=10),
            VariableSpec("albedo", lr=1e-2, clamp=(0.0, 1.0)),
            VariableSpec("roughness", lr=0.0, clamp=(0.02, 1.0)),
        ),
        render_upsample_iter=(),
        curvature_mult=0.002,
        curvature_epsilon=0.04,
    )
    takeover = TakeoverConfig(
        spp=4, image_height=H, image_width=W, scene_scale=SCALE,
        laplacian_mult=1e-3,
    )
    scene0 = SdfScene.create(sdf_res=33, tex_res=4, envmap=env, init_albedo=0.5,
                             init_radius=0.25)
    tx = build_sdf_optimizer(opt_cfg)
    state = SdfOptState(step=jnp.int32(0), scene=scene0, opt_state=tx.init(scene0))
    step_fn = make_sdf_train_step(opt_cfg, takeover, tx, render_config=RCONF)

    cam_idx = jnp.arange(4, dtype=jnp.int32)
    first = None
    mask_first = None
    lasts = []
    for it in range(40):
        state, metrics = step_fn(
            state, cams, cam_idx, gt_images, gt_masks, jax.random.PRNGKey(it)
        )
        state = state.replace(scene=validate_params(state.scene, opt_cfg, it))
        if it == 0:
            first = float(metrics["view_loss"])
            mask_first = float(metrics["mask_loss"])
        if it >= 35:
            lasts.append(float(metrics["view_loss"]))
        mask_last = float(metrics["mask_loss"])
    assert np.isfinite(lasts).all()
    assert np.mean(lasts) < first * 0.7, (first, lasts)
    assert mask_last < mask_first * 0.3, (mask_first, mask_last)
