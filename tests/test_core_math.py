"""Unit tests for core math, coords, scene box, colliders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_emitter_tpu.data.scene_box import CropMode, SceneBox, intersect_aabb
from nerf_emitter_tpu.ops import colliders
from nerf_emitter_tpu.utils import coords
from nerf_emitter_tpu.utils.math import (
    linear_to_srgb,
    luminance,
    psnr,
    safe_exp,
    srgb_to_linear,
    ssim,
)


def test_safe_exp_clamps():
    x = jnp.array([0.0, 1.0, 1000.0])
    out = safe_exp(x)
    assert jnp.isfinite(out).all()
    assert np.isclose(out[0], 1.0)
    assert np.isclose(out[1], np.e, rtol=1e-6)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x, atol=1e-5)


def test_luminance():
    white = jnp.ones((4, 3))
    np.testing.assert_allclose(luminance(white), 1.0, rtol=1e-6)


def test_psnr_identical():
    img = jnp.ones((8, 8, 3)) * 0.5
    assert psnr(img, img) > 100


def test_ssim_identical():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (32, 32, 3))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    assert float(ssim(img, 1.0 - img)) < 0.5


def test_ssim_smooth_gradient_images():
    """The round-4 TPU defect: on SMOOTH images the windowed variance
    `filt(x*x) - mu^2` catastrophically cancels at default TPU conv
    precision, yielding |SSIM| >> 1 (published 11.1). With the
    Precision.HIGHEST fix, near-identical smooth ramps must score ~1 and
    every SSIM must stay in [-1, 1]. Mirrors tests_tpu/test_numerics.py,
    which runs this on the real chip."""
    y = jnp.linspace(0.0, 1.0, 64)[:, None, None]
    x = jnp.linspace(0.0, 1.0, 64)[None, :, None]
    a = jnp.broadcast_to(0.5 * y + 0.5 * x, (64, 64, 3))
    b = a + 1e-3 * jnp.sin(37.0 * y) * jnp.cos(23.0 * x)
    s_ab = float(ssim(a, jnp.clip(b, 0.0, 1.0)))
    assert -1.0 <= s_ab <= 1.0
    assert s_ab > 0.99
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-4)


def test_coords_roundtrip():
    pts = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    s = 1.5
    back = coords.unit_to_world(coords.world_to_unit(pts, s), s)
    np.testing.assert_allclose(back, pts, atol=1e-5)
    m = coords.world_to_unit_mat(s)
    np.testing.assert_allclose(
        coords.apply_homogeneous(m, pts), coords.world_to_unit(pts, s), atol=1e-5
    )


def test_mi_gl_inverse():
    m = np.asarray(coords.mi2gl_left()) @ np.asarray(coords.gl2mi_left())
    np.testing.assert_allclose(m, np.eye(4), atol=1e-6)


def test_intersect_aabb_hit_and_miss():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    origins = jnp.array([[0.0, 0.0, 5.0], [3.0, 3.0, 5.0]])
    dirs = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t_min, t_max, hit = intersect_aabb(origins, dirs, aabb)
    assert bool(hit[0, 0]) and not bool(hit[1, 0])
    np.testing.assert_allclose(t_min[0, 0], 4.0, atol=1e-5)
    np.testing.assert_allclose(t_max[0, 0], 6.0, atol=1e-5)


def test_crop_modes():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    nears = jnp.array([[0.05]])
    fars = jnp.array([[100.0]])

    box = SceneBox(aabb=aabb, crop_mode=CropMode.NORMAL)
    n, f = box.clip_near_far(o, d, nears, fars)
    np.testing.assert_allclose(n[0, 0], 4.0, atol=1e-5)
    np.testing.assert_allclose(f[0, 0], 6.0, atol=1e-5)

    box = SceneBox(aabb=aabb, crop_mode=CropMode.NEAR)
    n, f = box.clip_near_far(o, d, nears, fars)
    np.testing.assert_allclose(n[0, 0], 0.05, atol=1e-5)
    np.testing.assert_allclose(f[0, 0], 4.0, atol=1e-5)

    box = SceneBox(aabb=aabb, crop_mode=CropMode.FAR)
    n, f = box.clip_near_far(o, d, nears, fars)
    np.testing.assert_allclose(n[0, 0], 6.0, atol=1e-5)
    np.testing.assert_allclose(f[0, 0], 100.0, atol=1e-5)

    box = SceneBox(aabb=aabb, crop_mode=CropMode.FAR2INF)
    n, f = box.clip_near_far(o, d, nears, fars)
    np.testing.assert_allclose(n[0, 0], 6.0, atol=1e-5)
    assert float(f[0, 0]) > 1e5


def test_crop_miss_keeps_ray():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    o = jnp.array([[5.0, 5.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    nears, fars = jnp.array([[0.1]]), jnp.array([[50.0]])
    box = SceneBox(aabb=aabb, crop_mode=CropMode.FAR2INF)
    n, f = box.clip_near_far(o, d, nears, fars)
    np.testing.assert_allclose(n[0, 0], 0.1, atol=1e-6)


def test_far_intersect_collider():
    from nerf_emitter_tpu.cameras.rays import RayBundle

    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rays = RayBundle(
        origins=jnp.array([[0.0, 0.0, 5.0]]),
        directions=jnp.array([[0.0, 0.0, -1.0]]),
        pixel_area=jnp.ones((1, 1)),
        nears=jnp.zeros((1, 1)),
        fars=jnp.ones((1, 1)),
    )
    out = colliders.aabb_far_intersect_collider(rays, aabb)
    np.testing.assert_allclose(out.nears[0, 0], 6.0, atol=1e-5)


def test_inside_box_ray_starts_at_origin():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t_min, t_max, hit = intersect_aabb(o, d, aabb)
    assert bool(hit[0, 0])
    np.testing.assert_allclose(t_min[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(t_max[0, 0], 1.0, atol=1e-5)
