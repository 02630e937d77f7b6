"""Occlusion/background compositing data for real captures.

Re-design of nerfstudio/data/datasets/occlusion_dataset.py (:28-66) and the
compositing math (mitsuba_sdf.py:951-956, render_utils.py:232-245): real
turntable scenes contain foreground occluders (the capture rig) and a
static background; the SDF render of the object is composited as

    final = occlusion_rgb * occlusion_mask
          + (1 - occlusion_mask) * (render * obj_mask + bg * (1 - obj_mask))

Occlusion/background images are rendered from the NeRF once at takeover
(render_internal_mask / render_occlusion, mitsuba_sdf.py:607-681) using
CropMode.NEAR (content between camera and the object box) and
CropMode.FAR2INF (content behind the box).
"""

from __future__ import annotations

from typing import Optional

import flax.struct as struct
import jax
import jax.numpy as jnp

from ..cameras.cameras import Cameras
from ..data.scene_box import CropMode, SceneBox


@struct.dataclass
class OcclusionData:
    """Per-train-image occlusion layers (device-resident)."""

    occlusion_rgb: jax.Array  # (n, H, W, 3)
    occlusion_mask: jax.Array  # (n, H, W, 1) alpha of foreground occluders
    background_rgb: jax.Array  # (n, H, W, 3)


def composite_with_occlusion(
    render_rgb: jax.Array,
    render_mask: jax.Array,
    occ: OcclusionData,
    index: jax.Array,
) -> jax.Array:
    """Apply the reference compositing equation for one camera index."""
    o_rgb = occ.occlusion_rgb[index]
    o_m = occ.occlusion_mask[index]
    bg = occ.background_rgb[index]
    base = render_rgb * render_mask + bg * (1.0 - render_mask)
    return o_rgb * o_m + base * (1.0 - o_m)


def render_occlusion_layers(
    render_fn,
    params,
    cameras: Cameras,
    object_aabb: jax.Array,
    n_cameras: Optional[int] = None,
) -> OcclusionData:
    """Render the NeRF into occlusion (NEAR of the object box) and
    background (FAR2INF) layers for each training camera (the reference's
    render_internal_mask / render_occlusion passes).

    render_fn(params, cameras, cam_idx, H, W, aabb_box) -> outputs dict with
    'rgb' and 'accumulation'.
    """
    n = n_cameras if n_cameras is not None else len(cameras)
    near_box = SceneBox(aabb=object_aabb, crop_mode=CropMode.NEAR)
    far_box = SceneBox(aabb=object_aabb, crop_mode=CropMode.FAR2INF)
    occ_rgb, occ_m, bgs = [], [], []
    for i in range(n):
        near_out = render_fn(params, cameras, jnp.int32(i), aabb_box=near_box)
        far_out = render_fn(params, cameras, jnp.int32(i), aabb_box=far_box)
        occ_rgb.append(near_out["rgb"])
        occ_m.append(near_out["accumulation"])
        bgs.append(far_out["rgb"])
    return OcclusionData(
        occlusion_rgb=jnp.stack(occ_rgb),
        occlusion_mask=jnp.stack(occ_m),
        background_rgb=jnp.stack(bgs),
    )
