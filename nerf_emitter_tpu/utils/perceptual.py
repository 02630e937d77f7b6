"""Perceptual image distance (the reference's LPIPS slot).

The reference evaluates LPIPS(VGG) via torchmetrics
(nerfstudio/models/nerfacto.py:292-295). Pretrained VGG weights cannot be
fetched in this environment (zero egress), so the default here is a
**fixed-seed random-feature pyramid distance**: the LPIPS paper itself
(Zhang et al. 2018, Tab. 5) shows randomly-initialized conv features
correlate far better with human judgments than pixel metrics; with a
fixed PRNG seed the metric is deterministic and comparable across runs.
It is NOT numerically interchangeable with VGG-LPIPS — reported as
`lpips_rf` so numbers are never confused with the reference's.

If calibrated weights ARE available, point NERF_EMITTER_LPIPS_WEIGHTS at
an .npz of conv kernels named conv0..convN (HWIO layout) + per-stage
linear weights lin0..linN (C,), and the same pyramid runs with them
(reported as `lpips`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# (out_channels, kernel, stride) per stage — a VGG-ish shrinking pyramid
_STAGES = ((32, 5, 1), (64, 5, 2), (128, 3, 2), (192, 3, 2))


@functools.lru_cache(maxsize=1)
def _random_kernels():
    key = jax.random.PRNGKey(1772)  # fixed seed: the metric is deterministic
    kernels = []
    c_in = 3
    for c_out, k, _ in _STAGES:
        key, k1 = jax.random.split(key)
        w = jax.random.normal(k1, (k, k, c_in, c_out), jnp.float32)
        # unit-norm each filter (He-ish scale keeps activations bounded)
        w = w / jnp.sqrt(jnp.sum(w**2, axis=(0, 1, 2), keepdims=True) + 1e-8)
        kernels.append(w)
        c_in = c_out
    return tuple(kernels)


@functools.lru_cache(maxsize=1)
def _loaded_kernels():
    path = os.environ.get("NERF_EMITTER_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    import numpy as np

    data = np.load(path)
    convs = [jnp.asarray(data[f"conv{i}"]) for i in range(len(_STAGES))]
    lins = [jnp.asarray(data[f"lin{i}"]) for i in range(len(_STAGES))]
    return tuple(convs), tuple(lins)


def _features(img: jax.Array, kernels) -> list[jax.Array]:
    """img (H, W, 3) in [0,1] -> per-stage unit-normalized feature maps."""
    x = (img - 0.5)[None] * 2.0  # (1, H, W, 3) in [-1, 1]
    feats = []
    for w, (_, _, stride) in zip(kernels, _STAGES):
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(x)
        norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + 1e-10)
        feats.append(x / norm)
    return feats


def lpips(pred: jax.Array, gt: jax.Array) -> tuple[jax.Array, str]:
    """Perceptual distance between (H, W, 3) images in [0, 1].

    Returns (value, metric_name) — name is 'lpips' with calibrated
    weights, 'lpips_rf' with the random-feature fallback.
    """
    loaded = _loaded_kernels()
    if loaded is not None:
        kernels, lins = loaded
    else:
        kernels, lins = _random_kernels(), None
    f_p = _features(pred, kernels)
    f_g = _features(gt, kernels)
    total = 0.0
    for i, (a, b) in enumerate(zip(f_p, f_g)):
        d = (a - b) ** 2  # (1, h, w, c)
        if lins is not None:
            d = d * jnp.maximum(lins[i], 0.0)[None, None, None, :]
            total = total + jnp.mean(jnp.sum(d, axis=-1))
        else:
            total = total + jnp.mean(jnp.sum(d, axis=-1)) / len(f_p)
    return total, ("lpips" if lins is not None else "lpips_rf")
