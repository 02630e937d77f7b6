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
an .npz and the metric is reported as `lpips`. Two layouts:
- TRUE VGG16-LPIPS (exact torchmetrics/Zhang topology): keys
  `vgg_conv0..vgg_conv12` (HWIO) + `vgg_bias0..vgg_bias12` + `lin0..lin4`
  ((C,) non-negative per-tap 1x1 weights). Taps after relu1_2, relu2_2,
  relu3_3, relu4_3, relu5_3 with 2x2 maxpools between blocks and the
  official input shift/scale — numerically interchangeable with the
  reference's LPIPS(VGG) once the ported weights are dropped in (no
  egress here to fetch them; `scripts/port_lpips_weights.py` writes the
  .npz where torchvision exists).
- legacy pyramid: `conv0..convN` + `lin0..linN` running this module's
  4-stage pyramid with calibrated kernels.
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
    if "vgg_conv0" in data:
        return None  # handled by _loaded_vgg
    convs = [jnp.asarray(data[f"conv{i}"]) for i in range(len(_STAGES))]
    lins = [jnp.asarray(data[f"lin{i}"]) for i in range(len(_STAGES))]
    return tuple(convs), tuple(lins)


# VGG16 conv plan: (block, out_channels) for the 13 convs; LPIPS taps the
# relu after the LAST conv of each block (indices 1, 3, 6, 9, 12)
_VGG_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
_VGG_POOL_BEFORE = (2, 4, 7, 10)  # maxpool precedes these conv indices
_VGG_TAPS = (1, 3, 6, 9, 12)
# official LPIPS input scaling (ScalingLayer, Zhang et al. 2018 reference code)
_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)


@functools.lru_cache(maxsize=1)
def _loaded_vgg():
    path = os.environ.get("NERF_EMITTER_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    import numpy as np

    data = np.load(path)
    if "vgg_conv0" not in data:
        return None
    convs = tuple(jnp.asarray(data[f"vgg_conv{i}"]) for i in range(13))
    biases = tuple(jnp.asarray(data[f"vgg_bias{i}"]) for i in range(13))
    lins = tuple(jnp.asarray(data[f"lin{i}"]) for i in range(5))
    for i, (w, c) in enumerate(zip(convs, _VGG_CHANNELS)):
        assert w.shape == (3, 3, (3 if i == 0 else _VGG_CHANNELS[i - 1]), c), (
            f"vgg_conv{i} has shape {w.shape}"
        )
    return convs, biases, lins


def _vgg_features(img: jax.Array, convs, biases) -> list[jax.Array]:
    """img (H, W, 3) in [0,1] -> the 5 unit-normalized LPIPS tap features."""
    x = img[None] * 2.0 - 1.0
    x = (x - jnp.asarray(_LPIPS_SHIFT)) / jnp.asarray(_LPIPS_SCALE)
    feats = []
    for i, (w, b) in enumerate(zip(convs, biases)):
        if i in _VGG_POOL_BEFORE:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            # metric-bearing conv: default TPU (bf16-input) precision is not
            # trustworthy for eval numbers (see utils/math.py ssim)
            precision=jax.lax.Precision.HIGHEST,
        )
        x = jax.nn.relu(x + b[None, None, None, :])
        if i in _VGG_TAPS:
            norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + 1e-10)
            feats.append(x / norm)
    return feats


def _features(img: jax.Array, kernels) -> list[jax.Array]:
    """img (H, W, 3) in [0,1] -> per-stage unit-normalized feature maps."""
    x = (img - 0.5)[None] * 2.0  # (1, H, W, 3) in [-1, 1]
    feats = []
    for w, (_, _, stride) in zip(kernels, _STAGES):
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
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
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    vgg = _loaded_vgg()
    if vgg is not None:
        convs, biases, lins = vgg
        f_p = _vgg_features(pred, convs, biases)
        f_g = _vgg_features(gt, convs, biases)
        total = 0.0
        for lin, a, b in zip(lins, f_p, f_g):
            d = (a - b) ** 2
            d = jnp.sum(d * jnp.maximum(lin, 0.0)[None, None, None, :], axis=-1)
            total = total + jnp.mean(d)  # spatial mean per tap, summed
        return total, "lpips"
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
