"""Spatial distortions: scene contraction for unbounded scenes.

Re-design of nerfstudio/field_components/spatial_distortions.py:
- scene_contraction: mip-NeRF 360 L-inf contraction to the [-2, 2]^3 ball.
- fake_contraction (spatial_distortions.py:95-103): affine map of a fixed
  AABB to [-2, 2]^3 for bounded synthetic scenes — no nonlinearity, so HDR
  synthetic captures keep metric geometry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scene_contraction(positions: jax.Array, order: float | None = None) -> jax.Array:
    """Contract R^3 to the radius-2 ball: x if |x|<=1 else (2 - 1/|x|) x/|x|.
    order=None -> L2 norm; order=inf -> L-inf norm (nerfacto default)."""
    if order is None:
        mag = jnp.linalg.norm(positions, axis=-1, keepdims=True)
    else:
        mag = jnp.max(jnp.abs(positions), axis=-1, keepdims=True)
    mag = jnp.maximum(mag, 1e-10)
    return jnp.where(mag <= 1.0, positions, (2.0 - 1.0 / mag) * positions / mag)


def scene_contraction_inf(positions: jax.Array) -> jax.Array:
    return scene_contraction(positions, order=jnp.inf)


def fake_contraction(positions: jax.Array, aabb: jax.Array) -> jax.Array:
    """Affine map aabb -> [-2, 2]^3 (reference FakeContraction)."""
    unit = (positions - aabb[0]) / (aabb[1] - aabb[0])
    return unit * 4.0 - 2.0


def contracted_to_unit(positions: jax.Array) -> jax.Array:
    """[-2, 2]^3 -> [0, 1]^3 for hash-grid lookup."""
    return (positions + 2.0) / 4.0
