"""Volume-rendering compositors (renderers).

Re-design of nerfstudio/model_components/renderers.py for JAX. The reference
leans on nerfacc's packed CUDA accumulation (renderers.py:94-101); with
static (n_rays, n_samples) shapes these are plain jnp reductions that XLA
fuses into the field evaluation.

HDR semantics (renderers.py:230-235): when hdr=True the composited RGB is
NOT clamped to [0,1] and the white/last-sample background completion uses
linear radiance.

TPU layout rule (see cameras/rays.py): per-sample scalars — weights,
starts/ends, values — are (..., S) with the sample axis minor; only
vector quantities carry a trailing channel dim.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

BackgroundColor = str  # 'random' | 'white' | 'black' | 'last_sample'


def composite_rgb(
    rgb: jax.Array,
    weights: jax.Array,
    *,
    background_color: BackgroundColor = "random",
    bg_key: Optional[jax.Array] = None,
    hdr: bool = False,
    is_training: bool = True,
) -> jax.Array:
    """rgb: (..., S, 3), weights: (..., S) -> (..., 3)."""
    comp = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1, keepdims=True)

    if background_color == "last_sample":
        bg = rgb[..., -1, :]
    elif background_color == "white":
        bg = jnp.ones_like(comp)
    elif background_color == "black":
        bg = jnp.zeros_like(comp)
    elif background_color == "random":
        if bg_key is not None and is_training:
            bg = jax.random.uniform(bg_key, comp.shape)
        else:
            bg = jnp.zeros_like(comp)
    else:  # pragma: no cover
        raise ValueError(background_color)

    out = comp + bg * (1.0 - acc)
    if not hdr and not is_training:
        out = jnp.clip(out, 0.0, 1.0)
    return out


def composite_accumulation(weights: jax.Array) -> jax.Array:
    """(..., S) -> (..., 1)."""
    return jnp.sum(weights, axis=-1, keepdims=True)


def composite_depth(
    weights: jax.Array,
    ray_samples_starts: jax.Array,
    ray_samples_ends: jax.Array,
    *,
    method: str = "median",
    values: Optional[jax.Array] = None,
) -> jax.Array:
    """Depth compositing. weights/starts/ends/values: (..., S) -> (..., 1).

    method='expected': weight-averaged midpoint depth.
    method='median': depth where cumulative weight crosses 0.5.
    method='contrib': depth at the max weight*value sample — the reference's
    DepthRenderer('contrib') (renderers.py:322-399) used for light
    point-cloud contrib-depth.
    """
    steps = (ray_samples_starts + ray_samples_ends) / 2.0
    if method == "expected":
        eps = 1e-10
        depth = jnp.sum(weights * steps, axis=-1, keepdims=True) / (
            jnp.sum(weights, axis=-1, keepdims=True) + eps
        )
        return jnp.clip(depth, steps[..., :1], steps[..., -1:])
    if method == "median":
        cum = jnp.cumsum(weights, axis=-1)  # (..., S)
        total = cum[..., -1:]
        idx = jnp.sum(
            (cum < 0.5 * jnp.minimum(total * 2.0, 1.0)).astype(jnp.int32),
            axis=-1,
            keepdims=True,
        )
        idx = jnp.clip(idx, 0, steps.shape[-1] - 1)
        return jnp.take_along_axis(steps, idx, axis=-1)
    if method == "contrib":
        if values is None:
            raise ValueError("contrib depth needs per-sample values")
        contrib = weights * values  # (..., S)
        idx = jnp.argmax(contrib, axis=-1)[..., None]
        return jnp.take_along_axis(steps, idx, axis=-1)
    raise ValueError(method)  # pragma: no cover


def composite_normals(normals: jax.Array, weights: jax.Array) -> jax.Array:
    """(..., S, 3), (..., S) -> (..., 3)."""
    return jnp.sum(weights[..., None] * normals, axis=-2)


def composite_generic(values: jax.Array, weights: jax.Array) -> jax.Array:
    """values (..., S, C), weights (..., S) -> (..., C)."""
    return jnp.sum(weights[..., None] * values, axis=-2)
