"""Sensors for the SDF renderer: perspective + spherical, in render space.

Re-design of MitsubaSensorGenerator (nerfstudio/model_components/
mi_sensor_generators.py:32-89 — nerfstudio camera -> mi perspective sensor
with x-fov, principal point offsets, GL->Mi pose conversion) and the
`spherical_sensor` plugin (equirect envmap renders from a point). Here a
sensor is just a ray generator into the unit-cube render space: cameras
stay in ONE convention and only the world->unit scale-shift applies
(utils/coords.py), so the conversion matrix shuffling disappears.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cameras.cameras import Cameras
from ..utils import coords


def camera_rays_in_render_space(
    cameras: Cameras,
    cam_index: jax.Array,
    height: int,
    width: int,
    scene_scale: float,
    key: jax.Array | None = None,
    spp_jitter: bool = True,
    rotater=None,
    rot_id: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """All pixel rays of one camera, mapped world->unit cube.
    Returns (origins (H*W, 3), directions (H*W, 3)) in render space.
    Directions are NOT renormalized after the uniform scale (a uniform
    scale preserves direction).

    rotater + rot_id: turntable captures — the SDF object lives in the
    canonical frame, so world rays are inverse-rotated per the image's
    rotation id before the unit-cube mapping (the reference's
    rotater.apply_mi_sensor, mitsuba_sdf.py:929-932)."""
    yy, xx = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    pix = jnp.stack([yy, xx], -1).reshape(-1, 2)
    idx = jnp.full((pix.shape[0],), cam_index, jnp.int32)
    jitter = (
        jax.random.uniform(key, (pix.shape[0], 2))
        if (key is not None and spp_jitter)
        else None
    )
    bundle = cameras.generate_rays(idx, pix, jitter=jitter)
    o_w, d_w = bundle.origins, bundle.directions
    if rotater is not None and rot_id is not None:
        rid = jnp.broadcast_to(rot_id, o_w.shape[:1]).astype(jnp.int32)
        o_w, d_w = rotater.apply_rays_within(rid, o_w, d_w)
    o = coords.world_to_unit(o_w, scene_scale)
    return o, d_w  # uniform scale-shift keeps directions


def spherical_rays(
    center_unit: jax.Array, height: int, width: int
) -> tuple[jax.Array, jax.Array]:
    """Equirect ray fan from a point in render space (spherical sensor)."""
    ys = (jnp.arange(height) + 0.5) / height * jnp.pi
    xs = ((jnp.arange(width) + 0.5) / width - 0.5) * 2.0 * jnp.pi
    theta, phi = jnp.meshgrid(ys, xs, indexing="ij")
    sin_t = jnp.sin(theta)
    d = jnp.stack(
        [sin_t * jnp.sin(phi), jnp.cos(theta), -sin_t * jnp.cos(phi)], axis=-1
    ).reshape(-1, 3)
    o = jnp.broadcast_to(center_unit, d.shape)
    return o, d
