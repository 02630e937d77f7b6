"""TSDF fusion: initialize the SDF voxel grid from NeRF depth renders.

Re-design of the reference's takeover-time TSDF init
(nerfstudio/pipelines/mitsuba_sdf.py:563-605 tsdf_init +
nerfstudio/exporter/tsdf_utils.py:42-277): render depth images from the
training cameras with the NeRF, integrate them into a truncated signed
distance volume, then eikonal-redistance the result into a proper SDF.

TPU-first: instead of the reference's batched per-voxel python loop, the
whole fusion is ONE einsum-shaped program: voxel centers project into every
camera at once (vmapped pinhole projection + bilinear depth taps), masked
accumulation over cameras.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cameras.cameras import Cameras
from ..utils import coords
from .sdf_optimizer import SdfOptState  # noqa: F401  (re-export convenience)


def integrate_tsdf(
    cameras: Cameras,
    depth_images: jax.Array,  # (B, H, W, 1) euclidean depth along the ray
    res: int = 128,
    scene_scale: float = 1.0,
    truncation: float | None = None,
    chunk: int = 1 << 18,
    object_aabb: jax.Array | None = None,  # (2, 3) world box
) -> jax.Array:
    """Fuse depth maps into a TSDF on the unit cube -> (res, res, res, 1).

    depth is distance along the RAY (our renderers' convention), converted
    to z-depth via the view direction during projection.

    object_aabb: voxels OUTSIDE this world box are always free. Without it
    the ring-occluded volume (above/below the object, behind it from every
    camera that sees it) accumulates 'behind'-only evidence and fuses
    solid — measured 58% interior on a 48-view ring capture. The takeover
    assumes the object lives inside its carve-out box, so the clamp loses
    nothing.
    """
    h_img, w_img = depth_images.shape[1:3]
    if truncation is None:
        truncation = 4.0 / res  # ~4 voxels, matching common practice

    xs = jnp.linspace(0.0, 1.0, res)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    vox_unit = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
    vox_world = coords.unit_to_world(vox_unit, scene_scale)

    c2w = cameras.camera_to_worlds  # (B, 3, 4)
    # world->camera: R^T (p - t)
    r_t = jnp.swapaxes(c2w[:, :3, :3], 1, 2)  # (B, 3, 3)
    t = c2w[:, :3, 3]  # (B, 3)

    def fuse_chunk(vw):
        # vw: (V, 3) world voxels
        p_cam = jnp.einsum("bij,vj->bvi", r_t, vw) - jnp.einsum(
            "bij,bj->bi", r_t, t
        )[:, None, :]
        # OpenGL camera: -z forward
        z = -p_cam[..., 2]  # (B, V) depth along optical axis
        valid = z > 1e-6
        zc = jnp.maximum(z, 1e-6)
        u = cameras.fx[:, None] * p_cam[..., 0] / zc + cameras.cx[:, None]
        v = -cameras.fy[:, None] * p_cam[..., 1] / zc + cameras.cy[:, None]
        inside = (
            valid
            & (u >= 0)
            & (u <= w_img - 1)
            & (v >= 0)
            & (v <= h_img - 1)
        )
        ui = jnp.clip(u, 0, w_img - 1)
        vi = jnp.clip(v, 0, h_img - 1)
        u0 = jnp.floor(ui).astype(jnp.int32)
        v0 = jnp.floor(vi).astype(jnp.int32)
        u1 = jnp.minimum(u0 + 1, w_img - 1)
        v1 = jnp.minimum(v0 + 1, h_img - 1)
        fu = (ui - u0)[..., None]
        fv = (vi - v0)[..., None]
        b_idx = jnp.arange(depth_images.shape[0])[:, None]
        d00 = depth_images[b_idx, v0, u0]
        d01 = depth_images[b_idx, v0, u1]
        d10 = depth_images[b_idx, v1, u0]
        d11 = depth_images[b_idx, v1, u1]
        d = (
            d00 * (1 - fu) * (1 - fv)
            + d01 * fu * (1 - fv)
            + d10 * (1 - fu) * fv
            + d11 * fu * fv
        )[..., 0]
        # ray depth -> z depth: d_ray * cos = z; cos = z / |p_cam|
        norm = jnp.linalg.norm(p_cam, axis=-1)
        d_z = d * zc / jnp.maximum(norm, 1e-6)
        sdf_obs = d_z - z  # + in front of surface, - behind
        w_obs = (inside & (sdf_obs > -truncation)).astype(jnp.float32)
        tsdf_obs = jnp.clip(sdf_obs / truncation, -1.0, 1.0)
        num = jnp.sum(tsdf_obs * w_obs, axis=0)
        den = jnp.sum(w_obs, axis=0)
        # deep-interior evidence: observed but beyond the truncation band
        behind = jnp.sum(
            (inside & (sdf_obs <= -truncation)).astype(jnp.float32), axis=0
        )
        return num, den, behind

    nums, dens, behinds = [], [], []
    for start in range(0, vox_world.shape[0], chunk):
        n_, d_, b_ = jax.jit(fuse_chunk)(vox_world[start : start + chunk])
        nums.append(n_)
        dens.append(d_)
        behinds.append(b_)
    num = jnp.concatenate(nums)
    den = jnp.concatenate(dens)
    behind = jnp.concatenate(behinds)
    # observed band -> averaged tsdf; unobserved: behind some view -> solid
    # (-1), never seen -> free (+1). Redistancing turns this into distances.
    tsdf = jnp.where(
        den > 0,
        num / jnp.maximum(den, 1e-6),
        jnp.where(behind > 0, -1.0, 1.0),
    )
    if object_aabb is not None:
        inside_box = jnp.all(
            (vox_world > object_aabb[0]) & (vox_world < object_aabb[1]),
            axis=-1,
        )
        tsdf = jnp.where(inside_box, tsdf, 1.0)
    # scale back to unit-cube distances
    return (tsdf * truncation / (2.0 * scene_scale)).reshape(res, res, res, 1)


def tsdf_init_sdf(
    cameras: Cameras,
    depth_images: jax.Array,
    res: int = 128,
    scene_scale: float = 1.0,
    redistance_iters: int = 100,
    object_aabb: jax.Array | None = None,
) -> jax.Array:
    """TSDF fusion + eikonal redistancing -> a usable SDF init (the
    reference's fastsweep redistancing after marching cubes)."""
    from ..renderer.optimize import redistance

    tsdf = integrate_tsdf(
        cameras, depth_images, res, scene_scale, object_aabb=object_aabb
    )
    return redistance(tsdf, n_iters=redistance_iters)
