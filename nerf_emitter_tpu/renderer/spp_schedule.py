"""SPP scheduling + denoising utilities.

Re-design of nerfstudio/utils/mi_util.py:
- `divide_spp` (:84-104): split a total spp into power-of-two batches
  (Mueller 2017) so render memory is bounded; with jax.checkpoint the
  gradient stays exact for ALL batches (the reference attaches only one).
- `render_aggregate`'s spp batching is renderer/integrator.render_spp.
- The OptiX denoiser (:33-55) has no TPU equivalent; `bilateral_denoise`
  is a flag-compatible stand-in (joint bilateral on radiance guided by
  normal/depth), and `no_denoise` the no-op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def divide_spp(total_spp: int, spp_per_batch: int, power_of_two: bool = True) -> list[int]:
    """Split total_spp into batches each <= spp_per_batch; power_of_two
    yields descending power-of-two chunks (equal-variance halving)."""
    if total_spp <= 0:
        return []
    if not power_of_two:
        out = [spp_per_batch] * (total_spp // spp_per_batch)
        if total_spp % spp_per_batch:
            out.append(total_spp % spp_per_batch)
        return out
    out = []
    rest = total_spp
    while rest > 0:
        p = 1
        while p * 2 <= min(rest, spp_per_batch):
            p *= 2
        out.append(p)
        rest -= p
    return out


def bilateral_denoise(
    rgb: jax.Array,
    normal: jax.Array | None = None,
    depth: jax.Array | None = None,
    radius: int = 2,
    sigma_space: float = 2.0,
    sigma_color: float = 0.3,
    sigma_guide: float = 0.2,
) -> jax.Array:
    """Joint bilateral filter on an (H, W, 3) radiance image, optionally
    guided by (H, W, 3) normals and (H, W, 1) depth (the albedo/normal-
    guided OptiX mode's role)."""
    h, w, _ = rgb.shape
    acc = jnp.zeros_like(rgb)
    wsum = jnp.zeros((h, w, 1))
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = jnp.roll(rgb, (dy, dx), axis=(0, 1))
            w_s = jnp.exp(-(dy * dy + dx * dx) / (2 * sigma_space**2))
            w_c = jnp.exp(
                -jnp.sum((shifted - rgb) ** 2, -1, keepdims=True)
                / (2 * sigma_color**2)
            )
            weight = w_s * w_c
            if normal is not None:
                ns = jnp.roll(normal, (dy, dx), axis=(0, 1))
                weight = weight * jnp.exp(
                    -jnp.sum((ns - normal) ** 2, -1, keepdims=True)
                    / (2 * sigma_guide**2)
                )
            if depth is not None:
                ds = jnp.roll(depth, (dy, dx), axis=(0, 1))
                weight = weight * jnp.exp(
                    -((ds - depth) ** 2) / (2 * sigma_guide**2)
                )
            acc = acc + shifted * weight
            wsum = wsum + weight
    return acc / jnp.maximum(wsum, 1e-9)


def no_denoise(rgb: jax.Array, **_) -> jax.Array:
    return rgb
