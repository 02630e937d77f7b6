"""Coordinate conventions and world<->render-space transforms.

The reference glues two frameworks with different conventions and converts
between them (nerfstudio/utils/mi_gl_conversion.py:4-65: mi2gl_left /
gl2mi_left/right permutations plus a scale-shift [-s,s]^3 -> [0,1]^3).

This framework has ONE world convention — nerfstudio/OpenGL style:
camera-to-world with +x right, +y up, -z forward. The SDF renderer stores
its voxel grids in a unit cube "render space" [0,1]^3; the transforms below
map between world [-s,s]^3 and render space. A thin adapter (`gl_from_mi` /
`mi_from_gl`) keeps dataset/scene-XML compatibility with Mitsuba-convention
assets (+y up in both, but Mitsuba scenes use a y-up right-handed frame with
a 90-degree x<->z relabeling in the reference; we keep the same permutation
so reference datasets load identically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Permutation applied by the reference when moving Mitsuba points into GL
# world space (reference mi_gl_conversion.py: mi2gl_left). Kept for dataset
# compatibility: (x, y, z)_mi -> (x, z, -y)? The reference uses a constant
# 4x4; we adopt the same row pattern.
_MI2GL = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, -1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)
_GL2MI = np.linalg.inv(_MI2GL).astype(np.float32)


def mi2gl_left() -> jnp.ndarray:
    return jnp.asarray(_MI2GL)


def gl2mi_left() -> jnp.ndarray:
    return jnp.asarray(_GL2MI)


def apply_homogeneous(mat4: jax.Array, points: jax.Array) -> jax.Array:
    """Apply a 4x4 to (..., 3) points (full fp32 — geometry, not hot)."""
    return (
        jnp.matmul(points, mat4[:3, :3].T, precision=jax.lax.Precision.HIGHEST)
        + mat4[:3, 3]
    )


def apply_rotation(mat4: jax.Array, dirs: jax.Array) -> jax.Array:
    """Apply only the rotation/linear part of a 4x4 to (..., 3) directions."""
    return jnp.matmul(dirs, mat4[:3, :3].T, precision=jax.lax.Precision.HIGHEST)


def world_to_unit(points: jax.Array, scene_scale: float) -> jax.Array:
    """[-s, s]^3 world -> [0, 1]^3 render space (SDF grid domain)."""
    return (points / scene_scale + 1.0) * 0.5


def unit_to_world(points: jax.Array, scene_scale: float) -> jax.Array:
    """[0, 1]^3 render space -> [-s, s]^3 world."""
    return (points * 2.0 - 1.0) * scene_scale


def world_to_unit_mat(scene_scale: float) -> jnp.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] *= 0.5 / scene_scale
    m[:3, 3] = 0.5
    return jnp.asarray(m)


def unit_to_world_mat(scene_scale: float) -> jnp.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] *= 2.0 * scene_scale
    m[:3, 3] = -scene_scale
    return jnp.asarray(m)
