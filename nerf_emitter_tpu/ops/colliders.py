"""Scene colliders: set per-ray near/far before sampling.

Re-design of nerfstudio/model_components/scene_colliders.py:47-143:
- near/far collider (constant)
- AABB-intersect collider (near/far from box intersection)
- AABB far-intersect collider (start at box EXIT — rays escaping the object
  region, used by the emitter bridge so the NeRF only models environment)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..cameras.rays import RayBundle
from ..data.scene_box import intersect_aabb


def near_far_collider(rays: RayBundle, near: float, far: float) -> RayBundle:
    return rays.replace(
        nears=jnp.full_like(rays.nears, near),
        fars=jnp.full_like(rays.fars, far),
    )


def aabb_intersect_collider(
    rays: RayBundle, aabb: jnp.ndarray, near_plane: float = 0.05
) -> RayBundle:
    """Clip rays to the AABB; missing rays get a degenerate [near, near] span."""
    t_min, t_max, hit = intersect_aabb(rays.origins, rays.directions, aabb)
    nears = jnp.where(hit, jnp.maximum(t_min, near_plane), near_plane)
    fars = jnp.where(hit, jnp.maximum(t_max, nears + 1e-6), near_plane + 1e-6)
    return rays.replace(nears=nears, fars=fars)


def aabb_far_intersect_collider(
    rays: RayBundle, aabb: jnp.ndarray, near_plane: float = 0.05, far: float = 1e3
) -> RayBundle:
    """Start rays at the box EXIT (reference AABBBoxFarIntersectCollider,
    scene_colliders.py `far_intersect` flag): emitter-query rays begin where
    they leave the object bbox so the NeRF never integrates inside it."""
    t_min, t_max, hit = intersect_aabb(rays.origins, rays.directions, aabb)
    nears = jnp.where(hit, jnp.maximum(t_max, near_plane), near_plane)
    fars = jnp.full_like(rays.fars, far)
    return rays.replace(nears=nears, fars=jnp.maximum(fars, nears + 1e-6))
