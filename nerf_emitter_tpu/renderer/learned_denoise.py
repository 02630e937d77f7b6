"""Learned guided denoiser for final renders (KPCN-lite, noise2noise).

The reference's final-render pass runs the OptiX AI denoiser with
albedo/normal guidance (nerfstudio/utils/mi_util.py:33-55); its weights
are NVIDIA-proprietary and GPU-only, so the TPU stand-in has been the
joint bilateral filter (spp_schedule.bilateral_denoise). This module
closes the remaining gap with a SMALL learned denoiser designed for TPU:

- **Kernel prediction** (Bako et al. 2017, KPCN): a compact CNN predicts
  per-pixel softmax weights over a (2R+1)^2 window, applied to the HDR
  radiance. Convex weights conserve energy and can never hallucinate
  out-of-range HDR values — the failure mode of direct regression at
  high dynamic range — and the whole network is 3x3 convs + one 1x1
  head: pure MXU work that XLA fuses without any custom kernels.
- **Noise2noise self-supervision** (Lehtinen et al. 2018): two
  independent half-spp renders of the same view are each other's
  training target, so fitting needs NO clean reference — the renderer
  generates training pairs for free, per scene, exactly like the
  distilled emitter cache gets its teacher batches (serving/distill.py).
- Guidance features (normal, depth, log-luminance) enter only the
  kernel-prediction branch, mirroring the OptiX albedo/normal-guided
  mode.

Inputs are tonemapped to log1p space for conditioning; the predicted
kernel is applied in LINEAR HDR space, so the output is an exact convex
combination of input radiance samples.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    radius: int = 2  # kernel window = (2R+1)^2 taps
    hidden: int = 48
    depth: int = 4
    fit_steps: int = 400
    lr: float = 2e-3


class KernelPredictor(nn.Module):
    """(H, W, F) guidance features -> (H, W, (2R+1)^2) softmax weights."""

    radius: int = 2
    hidden: int = 48
    depth: int = 4

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        h = feats[None]  # NHWC with N=1
        for i in range(self.depth):
            h = nn.Conv(self.hidden, (3, 3), padding="SAME",
                        name=f"conv_{i}")(h)
            h = nn.relu(h)
        k = (2 * self.radius + 1) ** 2
        logits = nn.Conv(k, (1, 1), name="head")(h)[0]
        return jax.nn.softmax(logits, axis=-1)


def _features(rgb: jax.Array, normal, depth) -> jax.Array:
    """Conditioning stack: log1p radiance, log-luminance, normals, and a
    robustly normalized depth (guides are optional; zeros when absent)."""
    h, w, _ = rgb.shape
    lum = jnp.log1p(jnp.sum(rgb, -1, keepdims=True) / 3.0)
    feats = [jnp.log1p(jnp.maximum(rgb, 0.0)), lum]
    feats.append(
        normal if normal is not None else jnp.zeros((h, w, 3), rgb.dtype)
    )
    if depth is not None:
        lo = jnp.percentile(depth, 5.0)
        hi = jnp.percentile(depth, 95.0)
        feats.append((depth - lo) / jnp.maximum(hi - lo, 1e-6))
    else:
        feats.append(jnp.zeros((h, w, 1), rgb.dtype))
    return jnp.concatenate(feats, axis=-1)


def _window_stack(img: jax.Array, radius: int) -> jax.Array:
    """(H, W, C) -> (H, W, K, C) neighborhoods via shifts (edge-clamped).
    K = (2R+1)^2 shifts are static Python, unrolled at trace time."""
    h, w, _ = img.shape
    padded = jnp.pad(
        img, ((radius, radius), (radius, radius), (0, 0)), mode="edge"
    )
    taps = []
    for dy in range(2 * radius + 1):
        for dx in range(2 * radius + 1):
            taps.append(
                jax.lax.dynamic_slice(
                    padded, (dy, dx, 0), (h, w, img.shape[-1])
                )
            )
    return jnp.stack(taps, axis=2)


def apply_denoiser(
    params,
    rgb: jax.Array,
    normal: jax.Array | None = None,
    depth: jax.Array | None = None,
    config: DenoiserConfig = DenoiserConfig(),
) -> jax.Array:
    """Denoise an (H, W, 3) HDR radiance image with fitted params."""
    module = KernelPredictor(config.radius, config.hidden, config.depth)
    weights = module.apply(params, _features(rgb, normal, depth))
    stack = _window_stack(rgb, config.radius)  # (H, W, K, 3)
    return jnp.sum(stack * weights[..., None], axis=2)


def init_denoiser(key: jax.Array, config: DenoiserConfig = DenoiserConfig()):
    module = KernelPredictor(config.radius, config.hidden, config.depth)
    feats = jnp.zeros((8, 8, 8), jnp.float32)
    return module.init(key, feats)


def fit_denoiser(
    key: jax.Array,
    pairs: list[tuple],
    config: DenoiserConfig = DenoiserConfig(),
):
    """Noise2noise fit over [(rgb_a, rgb_b, normal, depth), ...] pairs of
    INDEPENDENT half-spp renders. Returns (params, final_loss).

    Loss is the symmetric relative L1 (ops/losses rgb metric family):
    |f(a)-b| / (|b|+eps) + |f(b)-a| / (|a|+eps) — HDR-robust, and the
    noise2noise argument makes its minimizer the clean radiance."""
    params = init_denoiser(key, config)
    opt = optax.adam(config.lr)
    opt_state = opt.init(params)

    def rel_l1(pred, target):
        return jnp.mean(
            jnp.abs(pred - target)
            / (jax.lax.stop_gradient(jnp.abs(target)) + 1e-2)
        )

    @jax.jit
    def step(params, opt_state, a, b, normal, depth):
        def loss_fn(p):
            fa = apply_denoiser(p, a, normal, depth, config)
            fb = apply_denoiser(p, b, normal, depth, config)
            return rel_l1(fa, b) + rel_l1(fb, a)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = jnp.inf
    for i in range(config.fit_steps):
        a, b, normal, depth = pairs[i % len(pairs)]
        params, opt_state, loss = step(params, opt_state, a, b, normal, depth)
    return params, float(loss)
