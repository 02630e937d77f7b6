"""Learned KPCN-lite denoiser (renderer/learned_denoise.py): kernel
prediction is a convex combination (energy conserving, HDR-safe), and the
noise2noise fit actually denoises — trained only on two independent noisy
buffers, the output must land closer to the (never seen) clean image than
the input. Stands in for the reference's OptiX denoiser pass
(nerfstudio/utils/mi_util.py:33-55)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_emitter_tpu.renderer.learned_denoise import (
    DenoiserConfig,
    apply_denoiser,
    fit_denoiser,
    init_denoiser,
)

TINY = DenoiserConfig(radius=1, hidden=8, depth=2, fit_steps=80, lr=5e-3)


def _clean(h=32, w=32):
    y = jnp.linspace(0, 1, h)[:, None]
    x = jnp.linspace(0, 1, w)[None, :]
    zero = jnp.zeros((h, w))
    base = jnp.stack(
        [zero + 0.5 + 0.4 * jnp.sin(6 * x), zero + 0.3 + 0.3 * y * x,
         zero + 0.2 + 0.5 * y],
        axis=-1,
    )
    # an HDR hot spot, the regime direct regression clips
    return base.at[8:12, 8:12].add(25.0)


def _noisy(clean, key, scale=0.25):
    # multiplicative noise ~ Monte Carlo radiance estimates
    return clean * (1.0 + scale * jax.random.normal(key, clean.shape))


def test_apply_is_convex_combination():
    params = init_denoiser(jax.random.PRNGKey(0), TINY)
    img = jnp.full((16, 16, 3), 3.7)
    out = apply_denoiser(params, img, config=TINY)
    # convex weights on a constant image reproduce it exactly
    np.testing.assert_allclose(np.asarray(out), 3.7, rtol=1e-5)

    clean = _clean(16, 16)
    out = apply_denoiser(params, clean, config=TINY)
    assert float(out.min()) >= float(clean.min()) - 1e-4
    assert float(out.max()) <= float(clean.max()) + 1e-4


def test_noise2noise_fit_denoises():
    clean = _clean()
    key = jax.random.PRNGKey(1)
    pairs = []
    normal = jnp.zeros(clean.shape)
    depth = jnp.linspace(1, 2, clean.shape[0])[:, None, None] * jnp.ones(
        clean.shape[:2] + (1,)
    )
    for i in range(3):
        key, ka, kb = jax.random.split(key, 3)
        pairs.append((_noisy(clean, ka), _noisy(clean, kb), normal, depth))

    params, loss = fit_denoiser(jax.random.PRNGKey(2), pairs, TINY)
    assert np.isfinite(loss)

    key, ke = jax.random.split(key)
    test_noisy = _noisy(clean, ke)
    out = apply_denoiser(params, test_noisy, normal, depth, TINY)

    def rel_err(x):
        return float(jnp.mean(jnp.abs(x - clean) / (jnp.abs(clean) + 1e-2)))

    assert rel_err(out) < 0.75 * rel_err(test_noisy), (
        f"denoiser did not help: {rel_err(out):.4f} vs"
        f" {rel_err(test_noisy):.4f}"
    )
    # HDR hot spot survives (no clipping/hallucination)
    assert float(out[8:12, 8:12].max()) > 5.0


def test_fit_scene_denoiser_hook_contract():
    """The pipeline hook caches params + config attributes (used by
    render_camera_outputs denoise='learned' and scripts/render.py)."""
    from nerf_emitter_tpu.pipelines.nerf_emitter import NerfEmitterPipeline

    assert hasattr(NerfEmitterPipeline, "fit_scene_denoiser")


@pytest.mark.parametrize("shape", [(9, 13), (16, 16)])
def test_apply_odd_shapes(shape):
    params = init_denoiser(jax.random.PRNGKey(0), TINY)
    img = jax.random.uniform(jax.random.PRNGKey(3), shape + (3,))
    out = apply_denoiser(params, img, config=TINY)
    assert out.shape == img.shape
    assert bool(jnp.all(jnp.isfinite(out)))
