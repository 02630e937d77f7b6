"""Metric-kernel invariants ON THE REAL CHIP.

Every quality gate in the project (NVS eval, relighting eval, the
distilled-emitter A/B) reads these metrics; round 4 shipped SSIM = 11.1
because nothing ever asserted |SSIM| <= 1 where the defect exists — on
the TPU. Mirrors tests/test_core_math.py::test_ssim_smooth_gradient_images
(the CPU regression) plus PSNR and lpips sanity, with the smooth-image
inputs that trigger the bf16-conv variance cancellation.

Reference metric stack: nerfstudio/models/nerfacto.py:480-526 (PSNR /
SSIM / LPIPS over eval images).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_emitter_tpu.utils.math import mape, psnr, ssim
from nerf_emitter_tpu.utils.perceptual import lpips


def _smooth_pair(h=64, w=64):
    """The adversarial case: smooth ramps, where filt(x*x) - mu^2 is a
    tiny difference of large numbers inside every 11x11 window."""
    y = jnp.linspace(0.0, 1.0, h)[:, None, None]
    x = jnp.linspace(0.0, 1.0, w)[None, :, None]
    a = jnp.broadcast_to(0.5 * y + 0.5 * x, (h, w, 3))
    b = jnp.clip(a + 1e-3 * jnp.sin(37.0 * y) * jnp.cos(23.0 * x), 0.0, 1.0)
    return a, b


def test_ssim_bounds_and_identity_on_chip():
    a, b = _smooth_pair()
    s_ab = float(jax.jit(ssim)(a, b))
    s_aa = float(jax.jit(ssim)(a, a))
    assert -1.0 <= s_ab <= 1.0, f"SSIM out of range on chip: {s_ab}"
    assert s_ab > 0.99
    assert s_aa == pytest.approx(1.0, abs=1e-3)


def test_ssim_noise_pair_reasonable_on_chip():
    key = jax.random.PRNGKey(0)
    a = jax.random.uniform(key, (64, 64, 3))
    b = jnp.clip(a + 0.05 * jax.random.normal(jax.random.PRNGKey(1), a.shape), 0, 1)
    s = float(jax.jit(ssim)(a, b))
    assert -1.0 <= s <= 1.0
    assert 0.2 < s < 1.0


def test_psnr_identity_and_monotone_on_chip():
    a, b = _smooth_pair()
    p_ab = float(jax.jit(psnr)(a, b))
    assert 40.0 < p_ab < 100.0  # 1e-3 perturbation => ~60 dB
    p_noisier = float(jax.jit(psnr)(a, jnp.clip(a + 0.1, 0, 1)))
    assert p_noisier < p_ab
    m = float(jax.jit(mape)(a + 0.5, b + 0.5))
    assert 0.0 <= m < 0.01


def test_lpips_bounds_on_chip():
    a, b = _smooth_pair()
    val, name = lpips(a, b)
    v = float(val)
    assert np.isfinite(v)
    assert 0.0 <= v < 1.0, f"{name} out of range on chip: {v}"
    v_self, _ = lpips(a, a)
    assert float(v_self) == pytest.approx(0.0, abs=1e-4)
