"""SceneBox, CropMode and AABB/ray intersection.

Re-design of the reference's scene carve-out machinery
(nerfstudio/data/scene_box.py:28-51 and the per-segment near/far logic in
nerfstudio/cameras/cameras.py:469-520): a ray can be clipped to the segment
before / inside / behind an axis-aligned box, which is how the object region
is carved out of the NeRF (the NeRF models environment only) and how
occluders and backgrounds are rendered in real scenes.

All functions are shape-static and jit-friendly.
"""

from __future__ import annotations

import enum
from typing import Optional

import flax.struct as struct
import jax
import jax.numpy as jnp

# Finite stand-in for "infinity" — keeping fars finite avoids NaNs in
# spacing warps while far exceeding any scene extent.
INF_FAR = 1e6


class CropMode(enum.Enum):
    NORMAL = 0  # keep segment inside the box
    NEAR = 1  # keep segment between camera and box entry
    FAR = 2  # keep segment behind box exit (up to default far)
    FAR2INF = 3  # behind box exit, extended to infinity
    NEAR2INF = 4  # whole ray to infinity (no box clipping)


def intersect_aabb(
    origins: jax.Array,
    directions: jax.Array,
    aabb: jax.Array,
    eps: float = 1e-10,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Slab-test ray/AABB intersection.

    origins/directions: (..., 3); aabb: (2, 3) [min; max].
    Returns (t_min, t_max, hit) with shapes (..., 1), (..., 1), (..., 1) bool.
    t values are clamped at >= 0 (intersections behind the origin ignored).
    """
    inv_dir = 1.0 / jnp.where(jnp.abs(directions) < eps, jnp.where(directions >= 0, eps, -eps), directions)
    t0 = (aabb[0] - origins) * inv_dir
    t1 = (aabb[1] - origins) * inv_dir
    t_small = jnp.minimum(t0, t1)
    t_big = jnp.maximum(t0, t1)
    t_min = jnp.max(t_small, axis=-1, keepdims=True)
    t_max = jnp.min(t_big, axis=-1, keepdims=True)
    hit = (t_min <= t_max) & (t_max > 0.0)
    t_min = jnp.maximum(t_min, 0.0)
    t_max = jnp.maximum(t_max, 0.0)
    return t_min, t_max, hit


@struct.dataclass
class SceneBox:
    """An AABB with an optional per-ray world transform and a crop mode.

    `from_world` (4x4) rotates rays into the box frame before the
    intersection test — the reference uses this for the turntable rotater
    (scene_box.py:40-51). crop_mode is static (python) metadata.
    """

    aabb: jax.Array  # (2, 3)
    from_world: Optional[jax.Array] = None  # (4, 4)
    crop_mode: CropMode = struct.field(pytree_node=False, default=CropMode.NORMAL)

    def get_center(self) -> jax.Array:
        return (self.aabb[0] + self.aabb[1]) / 2.0

    def get_diagonal_length(self) -> jax.Array:
        return jnp.linalg.norm(self.aabb[1] - self.aabb[0])

    def within(self, points: jax.Array) -> jax.Array:
        """(..., 3) -> (...,) bool: strictly inside the box."""
        return jnp.all((points > self.aabb[0]) & (points < self.aabb[1]), axis=-1)

    def clip_near_far(
        self,
        origins: jax.Array,
        directions: jax.Array,
        nears: jax.Array,
        fars: jax.Array,
    ) -> tuple[jax.Array, jax.Array]:
        """Apply crop_mode clipping; returns updated (nears, fars).

        Degenerate (empty) segments come back with near == far so downstream
        compositing renders nothing there.
        """
        o, d = origins, directions
        if self.from_world is not None:
            o = o @ self.from_world[:3, :3].T + self.from_world[:3, 3]
            d = d @ self.from_world[:3, :3].T
        t_min, t_max, hit = intersect_aabb(o, d, self.aabb)

        mode = self.crop_mode
        if mode == CropMode.NORMAL:
            new_near = jnp.where(hit, jnp.maximum(nears, t_min), nears)
            new_far = jnp.where(hit, jnp.minimum(fars, t_max), nears)
        elif mode == CropMode.NEAR:
            new_near = nears
            new_far = jnp.where(hit, jnp.minimum(fars, t_min), fars)
        elif mode == CropMode.FAR:
            new_near = jnp.where(hit, jnp.maximum(nears, t_max), nears)
            new_far = fars
        elif mode == CropMode.FAR2INF:
            new_near = jnp.where(hit, jnp.maximum(nears, t_max), nears)
            new_far = jnp.full_like(fars, INF_FAR)
        elif mode == CropMode.NEAR2INF:
            new_near = nears
            new_far = jnp.full_like(fars, INF_FAR)
        else:  # pragma: no cover
            raise ValueError(f"unknown crop mode {mode}")
        new_far = jnp.maximum(new_far, new_near)
        return new_near, new_far
