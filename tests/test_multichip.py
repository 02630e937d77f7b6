"""Builder-owned multi-device tests on the 8-virtual-CPU mesh.

The reference validates multi-GPU behavior only operationally (num_gpu=2
in its run scripts; SURVEY.md §4 'No distributed tests'). Here every
parallel mechanism gets a numerical parity assertion against the
single-device program:
- NeRF train step under a mesh (DDP analogue, train.py:206-214)
- SDF takeover step with ray-sharded rendering (pad_scatter analogue,
  mitsuba_sdf.py:878-912)
- the shard_map-wrapped megafused emitter query vs the staged XLA path
  (interpret-mode Pallas on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_emitter_tpu.cameras.cameras import Cameras
from nerf_emitter_tpu.cameras.rays import RayBundle
from nerf_emitter_tpu.data.datamanager import ImageDataset
from nerf_emitter_tpu.engine.train_loop import (
    TrainConfig,
    create_train_state,
    make_train_step,
)
from nerf_emitter_tpu.models.nerfacto import NerfactoModel
from nerf_emitter_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    replicated,
    shard_leading_axis,
)

N_DEV = 8


def _ring_dataset(n_imgs=8, h=8, w=8):
    c2ws = []
    for i in range(n_imgs):
        th = 2 * np.pi * i / n_imgs
        eye = 1.3 * np.array([np.cos(th), 0.3, np.sin(th)], np.float32)
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 1, 0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2ws.append(np.stack([right, up, -fwd, eye], axis=1))
    cams = Cameras(
        camera_to_worlds=jnp.asarray(np.stack(c2ws)),
        fx=jnp.full((n_imgs,), 10.0), fy=jnp.full((n_imgs,), 10.0),
        cx=jnp.full((n_imgs,), w / 2), cy=jnp.full((n_imgs,), h / 2),
        width=w, height=h,
    )
    images = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (n_imgs, h, w, 3)))
    return ImageDataset(cameras=cams, images=images)


def _tiny_model(n_imgs=8, **kw):
    return NerfactoModel(
        aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
        num_nerf_samples=8,
        num_proposal_samples=(16, 8),
        log2_hashmap_size=12,
        max_res=128,
        num_cameras=n_imgs,
        **kw,
    )


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= N_DEV, "conftest must force 8 CPU devices"
    return make_mesh(N_DEV)


def test_nerf_train_step_mesh_parity(mesh):
    """One data-parallel NeRF step on the mesh == the single-device step."""
    dataset = _ring_dataset()
    model = _tiny_model()
    cfg = TrainConfig(num_rays_per_batch=16 * N_DEV, near=0.05, far=4.0,
                      max_steps=10)
    rays = dataset.cameras.generate_rays(
        jnp.zeros((4,), jnp.int32), jnp.zeros((4, 2), jnp.int32),
        nears=cfg.near, fars=cfg.far,
    )
    state, tx = create_train_state(model, cfg, rays, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    # single device
    step1 = make_train_step(model, cfg, tx)
    s1, m1 = step1(jax.tree.map(jnp.copy, state), dataset, key)

    # mesh
    import dataclasses

    cfg_m = dataclasses.replace(cfg, data_axis=DATA_AXIS)
    state_m = jax.device_put(jax.tree.map(jnp.copy, state), replicated(mesh))
    ds_m = shard_leading_axis(dataset, mesh)
    step8 = make_train_step(model, cfg_m, tx, mesh=mesh)
    s8, m8 = step8(state_m, ds_m, key)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )
    flat1 = jax.tree.leaves(s1.params)
    flat8 = jax.tree.leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_takeover_step_mesh_smoke():
    """QUICK-TIER takeover-step mesh smoke (one compile, 2 devices, tiny
    shapes): the ray-sharded SDF step — the code path behind the driver's
    dryrun_multichip contract — executes and returns finite metrics on
    every quick gate, not only in the slow full-suite parity test."""
    from nerf_emitter_tpu.pipelines.nerf_emitter import make_nerf_emitter_fn
    from nerf_emitter_tpu.pipelines.sdf_optimizer import (
        SdfOptState,
        TakeoverConfig,
        build_sdf_optimizer,
        make_sdf_train_step,
    )
    from nerf_emitter_tpu.renderer.integrator import RenderConfig
    from nerf_emitter_tpu.renderer.optimize import SdfOptConfig, VariableSpec
    from nerf_emitter_tpu.renderer.scene import SdfScene
    from nerf_emitter_tpu.renderer.sphere_trace import SphereTraceConfig

    mesh2 = make_mesh(2)
    dataset = _ring_dataset(h=4, w=4)
    model = _tiny_model()
    cfg = TrainConfig(num_rays_per_batch=16, near=0.05, far=4.0, max_steps=10)
    rays = dataset.cameras.generate_rays(
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 2), jnp.int32),
        nears=cfg.near, fars=cfg.far,
    )
    state, _ = create_train_state(model, cfg, rays, jax.random.PRNGKey(0))
    object_aabb = jnp.asarray([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]])
    emitter_fn = make_nerf_emitter_fn(model, 1.0, object_aabb)(state.params)
    opt_cfg = SdfOptConfig(
        name="smoke", bsdf_type=0, loss="relative_l1",
        variables=(
            VariableSpec("sdf", lr=3e-3),
            VariableSpec("albedo", lr=1e-2, clamp=(0.0, 1.0)),
            VariableSpec("roughness", lr=0.0, clamp=(0.02, 1.0)),
        ),
        init_res=9, tex_res=4, render_upsample_iter=(), curvature_mult=0.0,
    )
    takeover = TakeoverConfig(spp=1, image_height=4, image_width=4,
                              scene_scale=1.0)
    rconf = RenderConfig(trace=SphereTraceConfig(max_steps=4, t_max=3.0))
    scene = SdfScene.create(sdf_res=9, tex_res=4)
    tx = build_sdf_optimizer(opt_cfg)
    sdf_state = jax.device_put(
        SdfOptState(step=jnp.int32(0), scene=scene, opt_state=tx.init(scene)),
        replicated(mesh2),
    )
    step = make_sdf_train_step(opt_cfg, takeover, tx, emitter_fn=emitter_fn,
                               render_config=rconf, mesh=mesh2,
                               data_axis=DATA_AXIS)
    gt = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 3)))
    _, metrics = step(sdf_state, dataset.cameras,
                      jnp.zeros((1,), jnp.int32), gt,
                      jnp.ones((1, 4, 4, 1)), jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))


def test_takeover_step_mesh_parity(mesh):
    """One SDF takeover step (NeRF emitter, ray-sharded render) on the mesh
    == the single-device step."""
    from nerf_emitter_tpu.pipelines.nerf_emitter import make_nerf_emitter_fn
    from nerf_emitter_tpu.pipelines.sdf_optimizer import (
        SdfOptState,
        TakeoverConfig,
        build_sdf_optimizer,
        make_sdf_train_step,
    )
    from nerf_emitter_tpu.renderer.integrator import RenderConfig
    from nerf_emitter_tpu.renderer.optimize import SdfOptConfig, VariableSpec
    from nerf_emitter_tpu.renderer.scene import SdfScene
    from nerf_emitter_tpu.renderer.sphere_trace import SphereTraceConfig

    dataset = _ring_dataset()
    model = _tiny_model()
    cfg = TrainConfig(num_rays_per_batch=32, near=0.05, far=4.0, max_steps=10)
    rays = dataset.cameras.generate_rays(
        jnp.zeros((4,), jnp.int32), jnp.zeros((4, 2), jnp.int32),
        nears=cfg.near, fars=cfg.far,
    )
    state, _ = create_train_state(model, cfg, rays, jax.random.PRNGKey(0))

    object_aabb = jnp.asarray([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]])
    emitter_fn = make_nerf_emitter_fn(model, 1.0, object_aabb)(state.params)
    opt_cfg = SdfOptConfig(
        name="parity", bsdf_type=0, loss="relative_l1",
        variables=(
            VariableSpec("sdf", lr=3e-3),
            VariableSpec("albedo", lr=1e-2, clamp=(0.0, 1.0)),
            VariableSpec("roughness", lr=0.0, clamp=(0.02, 1.0)),
        ),
        init_res=17, tex_res=4, render_upsample_iter=(), curvature_mult=0.0,
    )
    takeover = TakeoverConfig(spp=2, image_height=8, image_width=8,
                              scene_scale=1.0)
    rconf = RenderConfig(trace=SphereTraceConfig(max_steps=8, t_max=3.0))
    scene = SdfScene.create(sdf_res=17, tex_res=4)
    tx = build_sdf_optimizer(opt_cfg)
    sdf_state = SdfOptState(
        step=jnp.int32(0), scene=scene, opt_state=tx.init(scene)
    )
    b = 2
    gt = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (b, 8, 8, 3)))
    masks = jnp.ones((b, 8, 8, 1))
    args = (dataset.cameras, jnp.arange(b, dtype=jnp.int32), gt, masks,
            jax.random.PRNGKey(3))

    step1 = make_sdf_train_step(opt_cfg, takeover, tx, emitter_fn=emitter_fn,
                                render_config=rconf)
    s1, m1 = step1(jax.tree.map(jnp.copy, sdf_state), *args)

    state_m = jax.device_put(jax.tree.map(jnp.copy, sdf_state), replicated(mesh))
    step8 = make_sdf_train_step(opt_cfg, takeover, tx, emitter_fn=emitter_fn,
                                render_config=rconf, mesh=mesh,
                                data_axis=DATA_AXIS)
    s8, m8 = step8(state_m, *args)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.scene.sdf), np.asarray(s8.scene.sdf),
        rtol=2e-4, atol=1e-6,
    )


def test_eval_render_mesh_parity(mesh):
    """Full-image eval render sharded over the mesh == single device
    (the reference's indices_by_rank multi-rank eval)."""
    from nerf_emitter_tpu.engine.train_loop import make_render_fn
    from nerf_emitter_tpu.parallel.mesh import replicated

    dataset = _ring_dataset()
    model = _tiny_model()
    cfg = TrainConfig(num_rays_per_batch=32, near=0.05, far=4.0, max_steps=10)
    rays = dataset.cameras.generate_rays(
        jnp.zeros((4,), jnp.int32), jnp.zeros((4, 2), jnp.int32),
        nears=cfg.near, fars=cfg.far,
    )
    state, _ = create_train_state(model, cfg, rays, jax.random.PRNGKey(0))

    r1 = make_render_fn(model, cfg, chunk=16)
    out1 = r1(state.params, dataset.cameras, jnp.int32(0), 8, 8)

    params_m = jax.device_put(state.params, replicated(mesh))
    r8 = make_render_fn(model, cfg, chunk=16, mesh=mesh, data_axis=DATA_AXIS)
    out8 = r8(params_m, dataset.cameras, jnp.int32(0), 8, 8)
    np.testing.assert_allclose(
        np.asarray(out1["rgb"]), np.asarray(out8["rgb"]), rtol=2e-4, atol=1e-6
    )


def test_fused_query_shard_map_parity(mesh):
    """The shard_map-wrapped megafused Pallas query (interpret mode on CPU)
    matches the staged XLA query on every ray shard."""
    from nerf_emitter_tpu.ops.fused_field import make_fused_radiance_query
    from nerf_emitter_tpu.ops.mega_query import make_mega_radiance_query
    from nerf_emitter_tpu.pipelines.nerf_emitter import _shard_fused_query

    model = _tiny_model(implementation="freq")
    n = 8 * N_DEV  # deliberately NOT a multiple of 128: exercises padding
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=d,
        pixel_area=jnp.full((n, 1), 1e-4),
        nears=jnp.full((n, 1), 0.05),
        fars=jnp.full((n, 1), 4.0),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), rays)

    staged = make_fused_radiance_query(model)
    expect = np.asarray(staged(params, rays))

    fused = _shard_fused_query(make_mega_radiance_query(model), mesh, DATA_AXIS)
    got = np.asarray(jax.jit(lambda p, r: fused(p, r))(params, rays))
    assert got.shape == (n, 3)
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-4)
