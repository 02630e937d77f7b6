"""HDR / colorimetry / numeric helpers.

TPU-native re-design of the reference's HDR math:
- SafeExp output activation (reference: nerfstudio/fields/nerfacto_field.py:40-57)
- linear<->sRGB transforms (reference: nerfstudio/models/nerfacto.py:417-434)
- luminance for light-point extraction (reference:
  nerfstudio/model_components/output_light_pc.py)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Clamp for exp to avoid float32 overflow; the reference uses SAFE_EXP_MAX=88
# (patchable at render time, nerfstudio/scripts/render.py:271-273).
SAFE_EXP_MAX = 88.0

# Rec.709 luminance weights.
_LUMA = jnp.array([0.2126, 0.7152, 0.0722], dtype=jnp.float32)


def safe_exp(x: jax.Array, *, bias: float = 0.0, max_value: float = SAFE_EXP_MAX) -> jax.Array:
    """exp(min(x + bias, max_value)) — HDR radiance output activation (RawNeRF)."""
    return jnp.exp(jnp.minimum(x + bias, max_value))


def linear_to_srgb(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Linear radiance -> sRGB, with values clamped to [0, 1]."""
    x = jnp.clip(x, 0.0, 1.0)
    srgb = jnp.where(
        x <= 0.0031308,
        12.92 * x,
        1.055 * jnp.power(jnp.maximum(x, eps), 1.0 / 2.4) - 0.055,
    )
    return jnp.clip(srgb, 0.0, 1.0)


def srgb_to_linear(x: jax.Array) -> jax.Array:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))


def luminance(rgb: jax.Array) -> jax.Array:
    """Rec.709 luminance; rgb: (..., 3) -> (...)."""
    return jnp.sum(rgb * _LUMA, axis=-1)


def normalize(v: jax.Array, eps: float = 1e-24) -> jax.Array:
    """L2-normalize the last axis, NaN-safe in the backward pass.

    `v / max(|v|, eps)` still emits NaN gradients at v = 0 (vjp of |v| is
    0/0 there, and 0-cotangent * NaN = NaN); rsqrt(max(v.v, eps)) routes the
    degenerate branch through `max`, which zeroes the cotangent instead.
    """
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(n2, eps))


def expected_sin(mean: jax.Array, var: jax.Array) -> jax.Array:
    """E[sin(x)] for x ~ N(mean, var) — used by integrated positional encodings."""
    return jnp.exp(-0.5 * var) * jnp.sin(mean)


def masked_reduction(value: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of `value` over elements where mask is true (mask broadcastable)."""
    mask = jnp.broadcast_to(mask, value.shape).astype(value.dtype)
    return jnp.sum(value * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def psnr(pred: jax.Array, gt: jax.Array, max_val: float = 1.0) -> jax.Array:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def mape(pred: jax.Array, gt: jax.Array, eps: float = 1e-2) -> jax.Array:
    """Mean absolute percentage error for HDR images (reference nerfacto.py metrics)."""
    return jnp.mean(jnp.abs(pred - gt) / (jnp.abs(gt) + eps))


def ssim(pred: jax.Array, gt: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Structural similarity over (H, W, C) images, 11x11 gaussian window
    (shrunk to the largest odd tap count that fits images smaller than 11
    pixels — a VALID conv with window > image yields an empty mean = NaN).

    The window convs MUST run at Precision.HIGHEST: at the TPU's default
    (bf16-input) conv precision the variance term `filt(x*x) - mu^2`
    catastrophically cancels on smooth regions, producing |SSIM| >> 1
    (round-4 evals published SSIM 11.1 before this was root-caused). The
    variances are additionally clamped at 0 — they are variances, and
    residual rounding noise must not flip the denominator's sign."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    taps = min(11, pred.shape[0], pred.shape[1])
    taps = taps if taps % 2 == 1 else taps - 1
    # gaussian window, sigma 1.5
    x = jnp.arange(taps, dtype=jnp.float32) - (taps - 1) / 2.0
    g = jnp.exp(-0.5 * (x / 1.5) ** 2)
    g = g / jnp.sum(g)
    kernel = jnp.outer(g, g)[:, :, None, None]  # (taps, taps, 1, 1)

    def filt(img):
        # img: (H, W, C) -> depthwise conv per channel
        img = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
        out = jax.lax.conv_general_dilated(
            img,
            jnp.transpose(kernel, (2, 3, 0, 1)),  # (1, 1, taps, taps)
            window_strides=(1, 1),
            padding="VALID",
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.moveaxis(out[:, 0], 0, -1)

    mu_p, mu_g = filt(pred), filt(gt)
    mu_pp, mu_gg, mu_pg = mu_p * mu_p, mu_g * mu_g, mu_p * mu_g
    sigma_pp = jnp.maximum(filt(pred * pred) - mu_pp, 0.0)
    sigma_gg = jnp.maximum(filt(gt * gt) - mu_gg, 0.0)
    sigma_pg = filt(pred * gt) - mu_pg
    num = (2 * mu_pg + c1) * (2 * sigma_pg + c2)
    den = (mu_pp + mu_gg + c1) * (sigma_pp + sigma_gg + c2)
    return jnp.mean(num / den)
