"""Unit tests for cameras, ray sampling, compositing, losses."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_emitter_tpu.cameras.cameras import Cameras, make_spherical_rig
from nerf_emitter_tpu.ops import losses, rendering, samplers


def _simple_camera(n=1):
    c2w = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1), (n, 3, 4)
    )
    v = jnp.full((n,), 50.0)
    return Cameras(
        camera_to_worlds=c2w, fx=v, fy=v,
        cx=jnp.full((n,), 32.0), cy=jnp.full((n,), 32.0),
        width=64, height=64,
    )


def test_generate_rays_center_pixel_looks_forward():
    cams = _simple_camera()
    rays = cams.generate_rays(
        jnp.zeros((1,), jnp.int32), jnp.array([[32, 32]]),
        jitter=jnp.zeros((1, 2)),
    )
    # pixel (32,32) with cx=cy=32 and zero jitter -> straight down -z
    np.testing.assert_allclose(rays.directions[0], [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(jnp.linalg.norm(rays.directions, axis=-1), 1.0, atol=1e-6)


def test_generate_image_rays_shape():
    cams = _simple_camera()
    bundle = cams.generate_image_rays(0)
    assert bundle.origins.shape == (64, 64, 3)
    assert bundle.camera_indices.shape == (64, 64, 1)


def test_spherical_rig_covers_sphere():
    rig = make_spherical_rig(jnp.zeros(3), width=64, height=32)
    bundle = rig.generate_image_rays(0)
    dirs = bundle.directions.reshape(-1, 3)
    np.testing.assert_allclose(jnp.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
    # mean direction of a full sphere should be ~0
    assert float(jnp.abs(jnp.mean(dirs, axis=0)).max()) < 0.1


def _bundle(n_rays=4, near=0.1, far=10.0):
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n_rays, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    from nerf_emitter_tpu.cameras.rays import RayBundle

    return RayBundle(
        origins=jnp.zeros((n_rays, 3)),
        directions=d,
        pixel_area=jnp.full((n_rays, 1), 1e-4),
        nears=jnp.full((n_rays, 1), near),
        fars=jnp.full((n_rays, 1), far),
        camera_indices=jnp.zeros((n_rays, 1), jnp.int32),
    )


def test_spaced_sample_monotone_and_in_range():
    rb = _bundle()
    rs = samplers.spaced_sample(rb, 32, key=jax.random.PRNGKey(1))
    starts = rs.frustums.starts
    ends = rs.frustums.ends
    assert bool(jnp.all(ends >= starts))
    assert bool(jnp.all(starts >= rb.nears - 1e-5))
    assert bool(jnp.all(ends <= rb.fars + 1e-4))
    assert bool(jnp.all(rs.deltas >= 0))


def test_spaced_sample_deterministic_without_key():
    rb = _bundle()
    a = samplers.spaced_sample(rb, 16)
    b = samplers.spaced_sample(rb, 16)
    np.testing.assert_allclose(a.frustums.starts, b.frustums.starts)


def test_pdf_sample_concentrates_on_peak():
    rb = _bundle(n_rays=2, near=0.1, far=2.0)
    rs = samplers.spaced_sample(rb, 64, spacing_fn=samplers.spacing_linear,
                                spacing_fn_inv=samplers.spacing_linear_inv)
    mids = (rs.frustums.starts + rs.frustums.ends) / 2
    # weight peak near t=1.0
    w = jnp.exp(-200.0 * (mids - 1.0) ** 2)
    new = samplers.sample_pdf(rb, rs, w, 32, key=jax.random.PRNGKey(2),
                              spacing_fn_inv=samplers.spacing_linear_inv,
                              histogram_padding=0.0)
    new_mids = (new.frustums.starts + new.frustums.ends) / 2
    frac_near_peak = jnp.mean((jnp.abs(new_mids - 1.0) < 0.2).astype(jnp.float32))
    assert float(frac_near_peak) > 0.7


def test_get_weights_opaque_wall():
    rb = _bundle(n_rays=1, near=0.0, far=1.0)
    rs = samplers.spaced_sample(rb, 16, spacing_fn=samplers.spacing_linear,
                                spacing_fn_inv=samplers.spacing_linear_inv)
    dens = jnp.full((1, 16), 1e6)  # opaque everywhere
    w = rs.get_weights(dens)
    np.testing.assert_allclose(float(jnp.sum(w)), 1.0, atol=1e-4)
    # all mass in first sample
    assert float(w[0, 0]) > 0.99


def test_get_weights_empty_space():
    rb = _bundle(n_rays=1)
    rs = samplers.spaced_sample(rb, 16)
    w = rs.get_weights(jnp.zeros((1, 16)))
    np.testing.assert_allclose(w, 0.0, atol=1e-7)


def test_proposal_sample_pipeline():
    rb = _bundle(n_rays=4)

    def density_fn(pos, cam_idx):
        # density blob near origin dist 1
        r = jnp.linalg.norm(pos, axis=-1)
        return 10.0 * jnp.exp(-5.0 * (r - 1.0) ** 2)

    final, wlist, slist = samplers.proposal_sample(
        rb, [density_fn, density_fn], [32, 16], 8, key=jax.random.PRNGKey(3)
    )
    assert final.frustums.starts.shape == (4, 8)
    assert len(wlist) == 2 and len(slist) == 2
    assert bool(jnp.all(final.deltas >= -1e-6))


def test_composite_rgb_hdr_not_clamped():
    rgb = jnp.full((2, 4, 3), 5.0)
    w = jnp.full((2, 4), 0.25)
    out = rendering.composite_rgb(rgb, w, background_color="black", hdr=True, is_training=False)
    np.testing.assert_allclose(out, 5.0, rtol=1e-5)
    out_ldr = rendering.composite_rgb(rgb, w, background_color="black", hdr=False, is_training=False)
    np.testing.assert_allclose(out_ldr, 1.0, rtol=1e-5)


def test_composite_depth_methods():
    w = jnp.array([[0.0, 0.9, 0.1, 0.0]])
    starts = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    ends = starts + 1.0
    d_med = rendering.composite_depth(w, starts, ends, method="median")
    np.testing.assert_allclose(d_med[0, 0], 2.5, atol=1e-5)
    vals = jnp.array([[1.0, 1.0, 100.0, 1.0]])
    d_contrib = rendering.composite_depth(w, starts, ends, method="contrib", values=vals)
    np.testing.assert_allclose(d_contrib[0, 0], 3.5, atol=1e-5)


def test_hdr_losses_zero_at_equal():
    pred = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (32, 3))) + 0.1
    for name, fn in losses.RGB_LOSSES.items():
        assert float(fn(pred, pred)) == 0.0, name
        assert float(fn(pred, pred * 2.0)) > 0.0, name


def test_distortion_loss_prefers_compact():
    ss = jnp.linspace(0, 1, 17)[:16].reshape(1, 16)
    se = jnp.linspace(0, 1, 17)[1:].reshape(1, 16)
    w_spread = jnp.full((1, 16), 1.0 / 16)
    w_compact = jnp.zeros((1, 16)).at[0, 8].set(1.0)
    assert float(losses.distortion_loss(w_compact, ss, se)) < float(
        losses.distortion_loss(w_spread, ss, se)
    )


def test_interlevel_loss_zero_when_proposal_covers():
    # proposal == fine histogram -> loss 0
    bins = jnp.linspace(0, 1, 17)[None].repeat(2, 0)  # (2, 17)
    w = jnp.full((2, 16), 1.0 / 16)
    val = losses.interlevel_loss([w, w], [bins, bins])
    assert float(val) < 1e-6
