"""Cameras pytree and ray generation.

Re-design of nerfstudio/cameras/cameras.py for JAX: a stacked struct of
intrinsics/extrinsics, with `generate_rays` as a pure shape-static function
usable under jit/vmap. Supports perspective and equirectangular
(spherical-rig) cameras — the latter backs the reference's
`generate_rays_spherical` light-probe rig
(nerfstudio/model_components/output_light_pc.py:28-45) and the
`spherical_sensor` Mitsuba plugin (differentiable-sdf-rendering
sensors/spherical_sensor.py, reconstructed in SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional

import flax.struct as struct
import jax
import jax.numpy as jnp

from ..data.scene_box import SceneBox
from ..utils.math import normalize
from .rays import RayBundle

PERSPECTIVE = 0
EQUIRECTANGULAR = 1


@struct.dataclass
class Cameras:
    """Stacked cameras. All fields lead with the camera axis (n_cams, ...).

    camera_to_worlds: (n, 3, 4) OpenGL convention (+x right, +y up, -z fwd).
    fx, fy, cx, cy: (n,) floats (pixels). width/height are static ints.
    camera_type: static int (PERSPECTIVE | EQUIRECTANGULAR).
    """

    camera_to_worlds: jax.Array
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    camera_type: int = struct.field(pytree_node=False, default=PERSPECTIVE)

    def __len__(self) -> int:
        return self.camera_to_worlds.shape[0]

    def generate_rays(
        self,
        camera_indices: jax.Array,
        pixel_coords: jax.Array,
        *,
        nears: float | jax.Array = 0.05,
        fars: float | jax.Array = 1e3,
        aabb_box: Optional[SceneBox] = None,
        jitter: Optional[jax.Array] = None,
        pose_deltas: Optional[jax.Array] = None,
    ) -> RayBundle:
        """Generate rays for (y, x) integer pixel coords.

        camera_indices: (N,) int32; pixel_coords: (N, 2) int (row, col).
        jitter: optional (N, 2) in [0,1) for stratified subpixel offsets
        (defaults to pixel centers, 0.5).
        pose_deltas: optional (n_cams, 3, 4) additive SE3-ish correction
        applied as c2w_adj = c2w + delta (camera-optimizer hook).
        """
        c2w = self.camera_to_worlds[camera_indices]  # (N, 3, 4)
        if pose_deltas is not None:
            c2w = c2w + pose_deltas[camera_indices]
        fx = self.fx[camera_indices]
        fy = self.fy[camera_indices]
        cx = self.cx[camera_indices]
        cy = self.cy[camera_indices]

        if jitter is None:
            jitter = jnp.full(pixel_coords.shape, 0.5, dtype=jnp.float32)
        y = pixel_coords[..., 0].astype(jnp.float32) + jitter[..., 0]
        x = pixel_coords[..., 1].astype(jnp.float32) + jitter[..., 1]

        if self.camera_type == PERSPECTIVE:
            # Camera-space dirs, OpenGL: -z forward, y up (image rows go down).
            dx = (x - cx) / fx
            dy = -(y - cy) / fy
            dirs_cam = jnp.stack([dx, dy, -jnp.ones_like(dx)], axis=-1)
            # pixel footprint (solid angle at unit distance)
            pixel_area = (1.0 / (fx * fy))[..., None]
        elif self.camera_type == EQUIRECTANGULAR:
            # x in [0, W) -> phi in [-pi, pi); y in [0, H) -> theta in [0, pi]
            w = jnp.float32(self.width)
            h = jnp.float32(self.height)
            phi = (x / w - 0.5) * 2.0 * jnp.pi
            theta = y / h * jnp.pi
            sin_t = jnp.sin(theta)
            dirs_cam = jnp.stack(
                [sin_t * jnp.sin(phi), jnp.cos(theta), -sin_t * jnp.cos(phi)],
                axis=-1,
            )
            pixel_area = ((2.0 * jnp.pi / w) * (jnp.pi / h) * jnp.maximum(sin_t, 1e-4))[..., None]
        else:  # pragma: no cover
            raise ValueError(f"unknown camera type {self.camera_type}")

        directions = normalize(
            jnp.einsum(
                "nij,nj->ni",
                c2w[..., :3, :3],
                dirs_cam,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        origins = c2w[..., :3, 3]

        n = jnp.broadcast_to(jnp.asarray(nears, jnp.float32), (*directions.shape[:-1], 1))
        f = jnp.broadcast_to(jnp.asarray(fars, jnp.float32), (*directions.shape[:-1], 1))
        if aabb_box is not None:
            n, f = aabb_box.clip_near_far(origins, directions, n, f)

        return RayBundle(
            origins=origins,
            directions=directions,
            pixel_area=pixel_area,
            nears=n,
            fars=f,
            camera_indices=camera_indices[..., None].astype(jnp.int32),
        )

    def generate_image_rays(self, camera_index: int, **kwargs) -> RayBundle:
        """All rays of one camera, shaped (H, W, ...)."""
        yy, xx = jnp.meshgrid(
            jnp.arange(self.height), jnp.arange(self.width), indexing="ij"
        )
        coords = jnp.stack([yy, xx], axis=-1).reshape(-1, 2)
        idx = jnp.full((coords.shape[0],), camera_index, dtype=jnp.int32)
        bundle = self.generate_rays(idx, coords, **kwargs)
        return bundle.reshape((self.height, self.width))


def make_spherical_rig(center: jax.Array, width: int = 4096, height: int = 2048) -> Cameras:
    """A single equirect camera at `center` — the reference's light-probe rig
    (output_light_pc.py:28-45) used for light point-cloud extraction and
    envmap rendering."""
    c2w = jnp.concatenate([jnp.eye(3), center.reshape(3, 1)], axis=1)[None]
    one = jnp.ones((1,), jnp.float32)
    return Cameras(
        camera_to_worlds=c2w,
        fx=one, fy=one,
        cx=one * (width / 2), cy=one * (height / 2),
        width=width, height=height,
        camera_type=EQUIRECTANGULAR,
    )
