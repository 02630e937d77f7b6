"""Integration tests of the two-phase pipeline: NeRF pretrain -> takeover
with the NeRF-as-emitter bridge (sdf-nerfacto) and the env-guiding baseline
(sdf-gt-envmap), at tiny scale — the reference's 2-iteration smoke-train
pattern (tests/test_train.py there)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_emitter_tpu.data.datamanager import build_dataset
from nerf_emitter_tpu.data.dataparsers.instant_ngp import (
    InstantNGPDataparserConfig,
    parse_instant_ngp,
)
from nerf_emitter_tpu.data.synthetic import make_synthetic_dataset
from nerf_emitter_tpu.engine.train_loop import TrainConfig
from nerf_emitter_tpu.models.nerfacto import NerfactoModel
from nerf_emitter_tpu.pipelines.nerf_emitter import (
    NerfEmitterPipeline,
    NerfEmitterPipelineConfig,
    make_nerf_emitter_fn,
)
from nerf_emitter_tpu.renderer.integrator import RenderConfig
from nerf_emitter_tpu.renderer.optimize import SdfOptConfig, VariableSpec
from nerf_emitter_tpu.renderer.sphere_trace import SphereTraceConfig


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    make_synthetic_dataset(d, n_views=6, width=24, height=24)
    cfg = InstantNGPDataparserConfig(data=d, eval_mode="all")
    dataset = build_dataset(parse_instant_ngp(cfg, "train"))

    model = NerfactoModel(
        aabb=((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
        num_nerf_samples=8,
        num_proposal_samples=(12, 8),
        log2_hashmap_size=12,
        max_res=128,
        num_cameras=6,
        appearance_embedding_dim=4,
    )
    train_cfg = TrainConfig(
        num_rays_per_batch=128, near=0.05, far=3.0, max_steps=20, anneal_steps=5
    )
    opt_cfg = SdfOptConfig(
        name="tiny",
        bsdf_type=0,
        loss="relative_l1",
        variables=(
            VariableSpec("sdf", lr=3e-3, redistance_freq=0),
            VariableSpec("albedo", lr=1e-2, clamp=(0.0, 1.0)),
            VariableSpec("roughness", lr=0.0, clamp=(0.02, 1.0)),
        ),
        init_res=17,
        tex_res=4,
        render_upsample_iter=(),
        curvature_mult=0.0,
    )
    return dataset, model, train_cfg, opt_cfg


def _pipe_config(**kw):
    base = dict(
        takeover_step=3,
        mi_opt_steps=2,
        scene_scale=1.0,
        object_aabb=((-0.3, -0.3, -0.3), (0.3, 0.3, 0.3)),
        proposal_rebuild_every=10,
        tsdf_init_res=24,
        tsdf_depth_downscale=2,
        batch_size=2,
        spp=2,
        takeover_image_size=16,
    )
    base.update(kw)
    return NerfEmitterPipelineConfig(**base)


def test_nerf_emitter_fn_escaped_rays(tiny_setup):
    dataset, model, train_cfg, opt_cfg = tiny_setup
    rays = dataset.cameras.generate_rays(
        jnp.zeros((4,), jnp.int32), jnp.zeros((4, 2), jnp.int32),
        nears=0.05, fars=3.0,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), rays)
    aabb = jnp.asarray([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]])
    fn = make_nerf_emitter_fn(model, 1.0, aabb)(params)
    x = jnp.full((8, 3), 0.5)  # render-space points at the cube center
    d = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rgb = fn(x, d)
    assert rgb.shape == (8, 3)
    assert bool(jnp.all(jnp.isfinite(rgb))) and bool(jnp.all(rgb >= 0))

    # gradient flows to query rays (the emitter backward of the reference)
    g = jax.grad(lambda xx: jnp.sum(fn(xx, d)))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_two_phase_sdf_nerfacto(tiny_setup):
    dataset, model, train_cfg, opt_cfg = tiny_setup
    pipe = NerfEmitterPipeline(
        _pipe_config(guiding_type="vmf"),
        model, train_cfg, opt_cfg, dataset,
        render_config=RenderConfig(trace=SphereTraceConfig(max_steps=16, t_max=3.0)),
    )
    pipe.guiding.downscale = 8
    pipe.guiding.n_clusters = 4
    pipe.guiding.max_points = 256
    key = jax.random.PRNGKey(0)
    metrics = []
    for step in range(5):  # 3 nerf + 2 takeover
        key, k = jax.random.split(key)
        metrics.append(pipe.train_iteration(step, k))
    assert pipe.sdf_state is not None
    assert int(pipe.sdf_state.step) == 2
    for m in metrics:
        assert np.isfinite(float(m["loss"])), m
    # guiding mixture loaded
    assert pipe.sdf_state.scene.guiding is not None
    assert pipe.sdf_state.scene.guiding.positions.shape[1] == 3

    # serving path
    out = pipe.render_camera_outputs(dataset, 0, jax.random.PRNGKey(9), spp=2)
    assert out["rgb"].shape == (24, 24, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()


@pytest.mark.slow
def test_two_phase_distilled_emitter(tiny_setup):
    """distill_emitter=True: takeover distills the light-field cache
    (serving/distill.py) and still trains to finite metrics."""
    dataset, model, train_cfg, opt_cfg = tiny_setup
    pipe = NerfEmitterPipeline(
        _pipe_config(guiding_type="vmf", distill_emitter=True, distill_steps=8),
        model, train_cfg, opt_cfg, dataset,
        render_config=RenderConfig(trace=SphereTraceConfig(max_steps=16, t_max=3.0)),
    )
    pipe.guiding.downscale = 8
    pipe.guiding.n_clusters = 4
    pipe.guiding.max_points = 256
    key = jax.random.PRNGKey(0)
    metrics = []
    for step in range(5):  # 3 nerf + 2 takeover
        key, k = jax.random.split(key)
        metrics.append(pipe.train_iteration(step, k))
    assert int(pipe.sdf_state.step) == 2
    for m in metrics:
        assert np.isfinite(float(m["loss"])), m
    assert np.isfinite(pipe.distill_fidelity["rmse_log"])


def test_sdf_gt_envmap_pipeline(tiny_setup, tmp_path):
    dataset, model, train_cfg, opt_cfg = tiny_setup
    # GT envmap on disk
    import numpy as onp

    env = onp.ones((8, 16, 3), onp.float32) * 1.2
    onp.save(tmp_path / "env.npy", env)

    pipe = NerfEmitterPipeline(
        _pipe_config(
            takeover_step=0, guiding_type="env",
            env_path=str(tmp_path / "env.npy"),
        ),
        model, train_cfg, opt_cfg, dataset,
        render_config=RenderConfig(trace=SphereTraceConfig(max_steps=16, t_max=3.0)),
    )
    key = jax.random.PRNGKey(0)
    for step in range(2):
        key, k = jax.random.split(key)
        m = pipe.train_iteration(step, k)
        assert np.isfinite(float(m["loss"]))
    assert pipe.sdf_state.scene.envmap is not None
    assert pipe.sdf_state.scene.guiding is None


def test_nerf_emitter_fn_turntable_rotation(tiny_setup):
    """With a rotater, the emitter query at rotation id r equals the
    unrotated query along the canonical->world rotated ray (the reference's
    rotater.apply_sdf_scene on the nerf emitter)."""
    from nerf_emitter_tpu.fields.rotater import Rotater

    dataset, model, train_cfg, opt_cfg = tiny_setup
    rays = dataset.cameras.generate_rays(
        jnp.zeros((4,), jnp.int32), jnp.zeros((4, 2), jnp.int32),
        nears=0.05, fars=3.0,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), rays)
    aabb = jnp.asarray([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]])
    rot = Rotater.from_axis_angle(4, center=jnp.zeros(3))

    fn_of = make_nerf_emitter_fn(model, 1.0, aabb, rotater=rot)
    x = jnp.full((8, 3), 0.5)
    d = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # id 0 is the identity -> equals the no-rotater query
    rgb_id0 = fn_of(params, rot_id=jnp.int32(0))(x, d)
    rgb_plain = make_nerf_emitter_fn(model, 1.0, aabb)(params)(x, d)
    np.testing.assert_allclose(rgb_id0, rgb_plain, rtol=1e-5)

    # id 1 (90 deg about +y): manually rotate the CANONICAL ray into world
    # and compare against the plain emitter on those world rays. A 90-deg
    # rotation maps the axis-aligned object cube to itself, so the
    # canonical-frame box-exit distance matches the world-frame one and the
    # two paths must agree exactly.
    rgb_rot = fn_of(params, rot_id=jnp.int32(1))(x, d)
    rid = jnp.ones((8,), jnp.int32)
    from nerf_emitter_tpu.utils import coords

    x_w = coords.world_to_unit(
        rot.apply_points(rid, coords.unit_to_world(x, 1.0)), 1.0
    )
    d_w = rot.apply_dirs(rid, d)
    rgb_manual = make_nerf_emitter_fn(model, 1.0, aabb)(params)(x_w, d_w)
    np.testing.assert_allclose(rgb_rot, rgb_manual, rtol=1e-4, atol=1e-5)


def test_set_relight_emitter_public_api(tiny_setup, tmp_path):
    """Relighting via the public pipeline API (reference eval.py
    emitter_xml_path swap, mitsuba_sdf.py:343-346): after takeover,
    set_relight_emitter replaces the serving emitter with an envmap and the
    serving render stays finite and changes with the light."""
    import numpy as onp

    from nerf_emitter_tpu.utils import exr

    dataset, model, train_cfg, opt_cfg = tiny_setup
    pipe = NerfEmitterPipeline(
        _pipe_config(guiding_type="vmf"),
        model, train_cfg, opt_cfg, dataset,
        render_config=RenderConfig(trace=SphereTraceConfig(max_steps=16, t_max=3.0)),
    )
    pipe.guiding.downscale = 8
    pipe.guiding.n_clusters = 4
    pipe.guiding.max_points = 256
    key = jax.random.PRNGKey(0)
    for step in range(4):
        key, k = jax.random.split(key)
        pipe.train_iteration(step, k)
    assert pipe.sdf_state is not None

    before = onp.asarray(
        pipe.render_camera_outputs(dataset, 0, jax.random.PRNGKey(9), spp=2)["rgb"]
    )

    env = onp.zeros((8, 16, 3), onp.float32)
    env[:, :8] = 4.0  # bright half-sky: clearly different illumination
    exr.write_exr(tmp_path / "relit.exr", env)
    pipe.set_relight_emitter(tmp_path / "relit.exr")
    assert pipe.sdf_state.scene.envmap is not None
    assert pipe.sdf_state.scene.guiding is None

    after = onp.asarray(
        pipe.render_camera_outputs(dataset, 0, jax.random.PRNGKey(9), spp=2)["rgb"]
    )
    assert onp.isfinite(after).all()
    assert onp.abs(after - before).max() > 1e-3  # the light actually changed


def test_emitter_samples_override(tiny_setup):
    """samples_override serves the emitter query at a reduced per-ray
    schedule with the SAME params (a TPU-first throughput knob the
    reference lacks — it always queries at the primary-view schedule,
    base_model.py:292-313). On a trained-for-0-steps smooth field the
    reduced-schedule radiance must agree statistically with the full one."""
    dataset, model, train_cfg, opt_cfg = tiny_setup
    rays = dataset.cameras.generate_rays(
        jnp.zeros((4,), jnp.int32), jnp.zeros((4, 2), jnp.int32),
        nears=0.05, fars=3.0,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), rays)
    aabb = jnp.asarray([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]])
    full = make_nerf_emitter_fn(model, 1.0, aabb)(params)
    # reduced schedule: 8 samples per level (the smallest multiple-of-8
    # counts the override accepts)
    cheap = make_nerf_emitter_fn(
        model, 1.0, aabb, samples_override=(8, 8, 8)
    )(params)
    x = jnp.full((64, 3), 0.5)
    d = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    r_full = full(x, d)
    r_cheap = cheap(x, d)
    assert r_cheap.shape == (64, 3)
    assert bool(jnp.all(jnp.isfinite(r_cheap))) and bool(jnp.all(r_cheap >= 0))
    # same field, fewer quadrature points: means must agree loosely
    mf, mc = float(jnp.mean(r_full)), float(jnp.mean(r_cheap))
    assert abs(mf - mc) <= 0.5 * max(mf, mc, 1e-3)
    # non-multiple-of-8 schedules are rejected up front
    with pytest.raises(ValueError):
        make_nerf_emitter_fn(model, 1.0, aabb, samples_override=(12, 8, 6))
