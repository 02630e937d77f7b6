"""Distilled light-field emitter cache (serving/distill.py).

The cache replaces the full NeRF emitter query (reference
base_model.py:292-313 serving semantics) with one MLP evaluation during
the frozen-NeRF takeover; these tests pin (1) the fit machinery converges
on a smooth analytic teacher, (2) the student closure honors the
make_nerf_emitter_fn contract (shapes, HDR nonnegativity, geometry
gradients, parameter detachment), (3) the pipeline gate distills and
still trains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_emitter_tpu.serving.distill import (
    DistillConfig,
    EPS_LOG,
    distill_emitter,
    make_student_emitter_fn_of,
)

AABB = jnp.asarray([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]])


def _analytic_teacher_fn_of(params, camera_index=None, rot_id=None):
    """Smooth HDR 'environment': a directional lobe plus a tint over the
    box-EXIT point. Same (x_unit, d) -> rgb contract as
    make_nerf_emitter_fn's closures — and, like the real NeRF teacher, a
    true light field: constant along a ray line (the student canonicalizes
    origins to the exit point, so an origin-dependent teacher would be
    unlearnable by construction)."""
    from nerf_emitter_tpu.serving.distill import _canonical_inputs

    def fn(x_unit, d):
        exit_pos, dd = _canonical_inputs(
            x_unit, d, scene_scale=1.0, object_aabb=AABB, far=1e3,
            rotater=None, rot_id=None,
        )
        lobe = jnp.maximum(dd @ jnp.asarray([0.3, 0.8, 0.52]), 0.0) ** 2
        tint = 0.5 + 0.5 * jnp.sin(3.0 * exit_pos)
        return 2.0 * lobe[:, None] * tint + 0.05

    return fn


@pytest.mark.slow
def test_distill_fits_smooth_teacher():
    module, params, fidelity = distill_emitter(
        jax.random.PRNGKey(0),
        {"params": {"field": {}}},  # no appearance embedding
        _analytic_teacher_fn_of,
        scene_scale=1.0,
        object_aabb=AABB,
        num_cameras=1,
        config=DistillConfig(
            steps=800, batch=256, hidden=64, depth=3, holdout_batches=2,
            scan_chunk=100,
        ),
    )
    # a smooth lobe x tint light field: the fit must be converging firmly
    # (CPU-sized budget; the production fidelity gate runs on chip at
    # steps=2000/batch=2^14 where the same fit lands far lower)
    assert fidelity["relrms_linear"] < 0.3, fidelity
    assert fidelity["rmse_log"] < 0.2, fidelity

    fn = make_student_emitter_fn_of(
        module, params, scene_scale=1.0, object_aabb=AABB
    )({"params": {"field": {}}})
    x = jnp.full((64, 3), 0.5)
    d = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pred = fn(x, d)
    teacher = _analytic_teacher_fn_of(None)(x, d)
    rel = np.asarray(jnp.abs(pred - teacher) / (teacher + 1e-2))
    assert rel.mean() < 0.3, rel.mean()


@pytest.fixture(scope="module")
def tiny_nerf():
    from nerf_emitter_tpu.cameras.rays import RayBundle
    from nerf_emitter_tpu.models.nerfacto import NerfactoModel

    model = NerfactoModel(
        aabb=((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
        num_nerf_samples=8,
        num_proposal_samples=(12, 8),
        log2_hashmap_size=12,
        max_res=128,
        num_cameras=6,
        appearance_embedding_dim=4,
    )
    n = 4
    d = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    rays = RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=d / jnp.linalg.norm(d, axis=-1, keepdims=True),
        pixel_area=jnp.full((n, 1), 1e-4),
        nears=jnp.full((n, 1), 0.05),
        fars=jnp.full((n, 1), 3.0),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), rays)
    return model, params


def test_student_contract_against_nerf_teacher(tiny_nerf):
    from nerf_emitter_tpu.pipelines.nerf_emitter import make_nerf_emitter_fn
    from nerf_emitter_tpu.renderer.emitters import VMFMixture

    model, params = tiny_nerf
    teacher_fn_of = make_nerf_emitter_fn(model, 1.0, AABB, detach_nerf=True)
    guiding = VMFMixture(
        positions=jnp.asarray([[0.5, 0.9, 0.5], [0.1, 0.5, 0.5]]),
        weights=jnp.asarray([0.7, 0.3]),
        stds=jnp.asarray([0.3, 0.5]),
    )
    module, sparams, fidelity = distill_emitter(
        jax.random.PRNGKey(0),
        params,
        teacher_fn_of,
        scene_scale=1.0,
        object_aabb=AABB,
        num_cameras=model.num_cameras,
        guiding=guiding,
        config=DistillConfig(
            steps=20, batch=256, hidden=32, depth=2, holdout_batches=1,
            scan_chunk=10,
        ),
    )
    assert np.isfinite(fidelity["final_fit_loss"])

    fn_of = make_student_emitter_fn_of(
        module, sparams, scene_scale=1.0, object_aabb=AABB
    )
    fn = fn_of(params, camera_index=3)
    x = jnp.full((16, 3), 0.5)
    d = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rgb = fn(x, d)
    assert rgb.shape == (16, 3)
    assert bool(jnp.all(jnp.isfinite(rgb))) and bool(jnp.all(rgb >= 0))

    # geometry gradients flow (the reparam/warp adjoint needs them)...
    g = jax.grad(lambda xx: jnp.sum(fn_of(params)(xx, d)))(x)
    assert np.isfinite(np.asarray(g)).all()
    # ...but NeRF parameter gradients are detached (no_update_nerf)
    gp = jax.grad(lambda pp: jnp.sum(fn_of(pp)(x, d)))(params)
    leaves = jax.tree_util.tree_leaves(gp)
    assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)


