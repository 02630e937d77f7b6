"""Warp-field reparameterization tests (renderer/reparam.py).

Validates the silhouette boundary gradients that the reference gets from
the Vicini et al. warp field (diff-sdf 'warponemis', SURVEY.md §2.3)
against finite differences on scenes where the pathwise gradient is
provably zero (a black object on a bright background: the ONLY image
derivative w.r.t. shape is the moving silhouette).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_emitter_tpu.renderer.grid3d import sphere_sdf_grid
from nerf_emitter_tpu.renderer.integrator import RenderConfig, render_direct
from nerf_emitter_tpu.renderer.reparam import WarpConfig, reparam_direction
from nerf_emitter_tpu.renderer.scene import SdfScene
from nerf_emitter_tpu.renderer.sphere_trace import SphereTraceConfig

GRID = 48
CAM = jnp.array([0.5, 0.5, -0.6])
TRACE = SphereTraceConfig(max_steps=64, coarse_steps=0, hit_eps=3e-4)


def _pinhole_rays(res, key=None):
    xs = (jnp.arange(res) + 0.5) / res
    gx, gy = jnp.meshgrid(xs, xs, indexing="ij")
    if key is not None:
        j = jax.random.uniform(key, (res, res, 2), minval=-0.5, maxval=0.5) / res
        gx, gy = gx + j[..., 0], gy + j[..., 1]
    target = jnp.stack([gx, gy, jnp.full_like(gx, 0.5)], -1).reshape(-1, 3)
    d = target - CAM
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.tile(CAM, (res * res, 1)), d


def _black_scene(r, cx=0.5):
    return SdfScene(
        sdf=sphere_sdf_grid(GRID, radius=r, center=(cx, 0.5, 0.5)),
        albedo=jnp.zeros((8, 8, 8, 3)),
        roughness=jnp.full((8, 8, 8, 1), 0.5),
    )


def _white_emitter(x, d):
    return jnp.ones((*d.shape[:-1], 3))


def _coverage_loss(r, reparam, res=64, n_jit=3):
    cfg = RenderConfig(trace=TRACE, use_visibility=False, reparam=reparam)
    scene = _black_scene(r)
    tot = 0.0
    for i in range(n_jit):
        o, d = _pinhole_rays(res, jax.random.PRNGKey(i))
        out = render_direct(
            scene, o, d, jax.random.PRNGKey(100 + i),
            emitter_fn=_white_emitter, config=cfg,
        )
        tot = tot + jnp.mean(out["rgb"])
    return tot / n_jit


def test_warp_primal_identity():
    """The warp must not change primal renders at all."""
    scene = _black_scene(0.22)
    o, d = _pinhole_rays(32)
    outs = {}
    for rp in ("soft", "warp"):
        cfg = RenderConfig(trace=TRACE, reparam=rp)
        outs[rp] = render_direct(
            scene, o, d, jax.random.PRNGKey(0),
            emitter_fn=_white_emitter, config=cfg,
        )
    # identical up to the 1-ulp renormalization of the warped directions
    np.testing.assert_allclose(
        np.asarray(outs["soft"]["rgb"]), np.asarray(outs["warp"]["rgb"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(outs["soft"]["depth"]), np.asarray(outs["warp"]["depth"]), atol=1e-5
    )


def test_warp_direction_and_jac_primal():
    """d_warped primal == directions; jacobian primal == 1."""
    sdf = sphere_sdf_grid(GRID, radius=0.22)
    o, d = _pinhole_rays(16)
    d_w, jac = reparam_direction(sdf, o, d, TRACE, WarpConfig())
    np.testing.assert_allclose(np.asarray(d_w), np.asarray(d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(jac), 1.0, atol=1e-6)


def test_silhouette_gradient_matches_fd():
    """Black object, white emitter: the pathwise gradient is exactly zero
    (soft path, rgb channel) and the warp must recover the full boundary
    term d(mean rgb)/d(radius) = -d(coverage)/dr to ~15%."""
    eps = 0.015
    fd = (_coverage_loss(0.22 + eps, "soft") - _coverage_loss(0.22 - eps, "soft")) / (
        2 * eps
    )
    g_warp = jax.grad(lambda r: _coverage_loss(r, "warp"))(0.22)
    assert float(fd) < -1.0  # sanity: the silhouette term is large
    np.testing.assert_allclose(float(g_warp), float(fd), rtol=0.15)


def test_silhouette_gradient_symmetry_zero():
    """Translating a centered sphere along x changes nothing for a
    symmetric camera: the warp gradient must vanish (not just be small)."""
    def loss(cx):
        cfg = RenderConfig(trace=TRACE, use_visibility=False, reparam="warp")
        o, d = _pinhole_rays(48)
        out = render_direct(
            _black_scene(0.22, cx), o, d, jax.random.PRNGKey(0),
            emitter_fn=_white_emitter, config=cfg,
        )
        return jnp.mean(out["rgb"])

    g = jax.grad(loss)(0.5)
    assert abs(float(g)) < 0.05


def test_warp_gradients_finite_on_textured_scene():
    """Full shading path (visibility + secondary warps) stays NaN-free."""
    scene = SdfScene(
        sdf=sphere_sdf_grid(GRID, radius=0.22),
        albedo=jnp.full((8, 8, 8, 3), 0.6),
        roughness=jnp.full((8, 8, 8, 1), 0.4),
    )
    cfg = RenderConfig(trace=TRACE, use_visibility=True, reparam="warp")
    o, d = _pinhole_rays(24)

    def loss(scene):
        out = render_direct(
            scene, o, d, jax.random.PRNGKey(0),
            emitter_fn=_white_emitter, config=cfg,
        )
        return jnp.mean(out["rgb"]) + jnp.mean(out["alpha"])

    grads = jax.grad(loss)(scene)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
