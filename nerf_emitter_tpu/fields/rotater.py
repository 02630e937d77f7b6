"""Rotater: turntable rotation of the scene/light relative to the object.

Re-design of nerfstudio/field_components/rotater.py:24-168: captures where
the object sits on a turntable under fixed lighting produce per-image
`rotation` tags; the NeRF must see the WORLD rotated per rotation id while
the object stays put. The reference mutates Mi sensors/envmaps and hooks a
`rotater` callable into RayBundle; here rotation is a pure function applied
to rays (or frustum sample positions inside a bounding region) before field
evaluation, vmapped over the batch via a per-ray rotation id.

Two sources of rotations:
- axis-angle about the scene center (synthetic turntables):
  angle = 2*pi * rot_id / n_rotations about +y,
- calibrated per-id 4x4 `transform_matrices` from the dataparser (real
  captures, nerfstudio_dataparser rotations dict).

An optional learnable per-rotation SO3xR3 correction (rotation id 0 frozen)
mirrors the reference's `rotation_optimizer`
(cameras/camera_optimizers.py:66-67,131-132).
"""

from __future__ import annotations

from typing import Optional

import flax.struct as struct
import jax
import jax.numpy as jnp


def _axis_angle_matrix(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rodrigues: (3,) axis (unit), scalar angle -> (3,3)."""
    x, y, z = axis[0], axis[1], axis[2]
    c, s = jnp.cos(angle), jnp.sin(angle)
    cc = 1.0 - c
    return jnp.array(
        [
            [c + x * x * cc, x * y * cc - z * s, x * z * cc + y * s],
            [y * x * cc + z * s, c + y * y * cc, y * z * cc - x * s],
            [z * x * cc - y * s, z * y * cc + x * s, c + z * z * cc],
        ]
    )


def exp_so3(w: jax.Array) -> jax.Array:
    """so3 exponential: (3,) -> (3,3) rotation.

    Written with Taylor-safe sinc terms so the GRADIENT at w=0 is finite
    (|w| is not differentiable at 0; pose-optimizer deltas start at 0)."""
    theta2 = jnp.sum(w * w)
    small = theta2 < 1e-8
    # evaluate the exact branch at a SAFE theta so the unselected branch
    # never produces inf/nan (jnp.where grad pitfall)
    safe_t2 = jnp.where(small, 1.0, theta2)
    safe_t = jnp.sqrt(safe_t2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / safe_t2)
    wx = jnp.array(
        [
            [0.0, -w[2], w[1]],
            [w[2], 0.0, -w[0]],
            [-w[1], w[0], 0.0],
        ]
    )
    return jnp.eye(3) + a * wx + b * (wx @ wx)


@struct.dataclass
class Rotater:
    """Per-rotation-id rigid transforms. transforms: (n_rot, 4, 4) mapping
    object frame -> rotated world frame for each id. center: (3,) rotation
    center. deltas: optional learnable (n_rot, 6) SO3xR3 corrections."""

    transforms: jax.Array  # (n_rot, 4, 4)
    center: jax.Array  # (3,)
    deltas: Optional[jax.Array] = None  # (n_rot, 6): (so3, translation)

    @staticmethod
    def from_axis_angle(
        n_rotations: int,
        center: jax.Array,
        axis: jax.Array = None,
        full_turn: float = 2.0 * jnp.pi,
    ) -> "Rotater":
        """Evenly spaced turntable rotations about `axis` through `center`
        (reference axis-angle mode)."""
        if axis is None:
            axis = jnp.array([0.0, 1.0, 0.0])
        mats = []
        for i in range(n_rotations):
            r = _axis_angle_matrix(axis, jnp.asarray(full_turn * i / n_rotations))
            m = jnp.eye(4)
            m = m.at[:3, :3].set(r)
            m = m.at[:3, 3].set(center - r @ center)
            mats.append(m)
        return Rotater(transforms=jnp.stack(mats), center=center)

    @staticmethod
    def from_angles(
        angles_deg,
        center: jax.Array,
        axis: jax.Array = None,
    ) -> "Rotater":
        """Per-id rotations from raw `rotation` tag values in DEGREES about
        `axis` through `center` (the reference's axis-angle mode,
        field_components/rotater.py:48-58: tags are angles, axis +y)."""
        if axis is None:
            axis = jnp.array([0.0, 1.0, 0.0])
        mats = []
        for a in [float(x) for x in angles_deg]:
            r = _axis_angle_matrix(axis, jnp.deg2rad(jnp.asarray(a)))
            m = jnp.eye(4)
            m = m.at[:3, :3].set(r)
            m = m.at[:3, 3].set(center - r @ center)
            mats.append(m)
        return Rotater(transforms=jnp.stack(mats), center=center)

    @staticmethod
    def from_matrices(transform_matrices: jax.Array, center: jax.Array) -> "Rotater":
        """Calibrated transforms from the dataparser (real captures)."""
        return Rotater(transforms=transform_matrices, center=center)

    def matrix(self, rot_id: jax.Array) -> jax.Array:
        """(...,) int ids -> (..., 4, 4) including learnable correction."""
        m = self.transforms[rot_id]
        if self.deltas is not None:
            d = self.deltas[rot_id]
            # freeze rotation 0 (the reference's zero-rotation anchor)
            frozen = (rot_id == 0)[..., None]
            d = jnp.where(frozen, 0.0, d)
            r = exp_so3(d[..., :3]) if d.ndim == 1 else jax.vmap(exp_so3)(d[..., :3])
            corr = jnp.zeros_like(m)
            corr = corr.at[..., :3, :3].set(r)
            corr = corr.at[..., :3, 3].set(d[..., 3:])
            corr = corr.at[..., 3, 3].set(1.0)
            m = jnp.einsum("...ij,...jk->...ik", corr, m)
        return m

    def apply_points(self, rot_id: jax.Array, points: jax.Array) -> jax.Array:
        """Rotate (..., 3) points by their per-element rotation id (...,)."""
        m = self.matrix(rot_id)
        return (
            jnp.einsum("...ij,...j->...i", m[..., :3, :3], points)
            + m[..., :3, 3]
        )

    def apply_dirs(self, rot_id: jax.Array, dirs: jax.Array) -> jax.Array:
        m = self.matrix(rot_id)
        return jnp.einsum("...ij,...j->...i", m[..., :3, :3], dirs)

    def apply_c2w(self, rot_id: jax.Array, c2w: jax.Array) -> jax.Array:
        """Rotate camera-to-world matrices (..., 3, 4) into the rotated
        world (reference: applying rotation to Mi sensors / c2w mats)."""
        m = self.matrix(rot_id)
        r = jnp.einsum("...ij,...jk->...ik", m[..., :3, :3], c2w[..., :3, :3])
        t = (
            jnp.einsum("...ij,...j->...i", m[..., :3, :3], c2w[..., :3, 3])
            + m[..., :3, 3]
        )
        return jnp.concatenate([r, t[..., :, None]], axis=-1)

    def apply_positions_within(
        self,
        rot_id: jax.Array,
        positions: jax.Array,
        dirs: Optional[jax.Array],
        bounding_radius: float,
    ) -> tuple[jax.Array, Optional[jax.Array]]:
        """World→canonical mapping of per-ray SAMPLE positions (n, S, 3) —
        the reference's RayBundle.rotater hook / apply_frustums
        (field_components/rotater.py:apply_frustums, cameras/rays.py:285):
        the NeRF sees the turntable object in ONE canonical pose by
        inverse-rotating samples that fall inside the bounding sphere, while
        the static environment outside stays world-framed. rot_id: (n,)."""
        m = self.matrix(rot_id)  # (n, 4, 4) canonical->world
        r_t = jnp.swapaxes(m[..., :3, :3], -1, -2)
        p = jnp.einsum(
            "nij,nsj->nsi", r_t, positions - m[:, None, :3, 3]
        )
        inside = (
            jnp.linalg.norm(positions - self.center, axis=-1, keepdims=True)
            < bounding_radius
        )
        p_out = jnp.where(inside, p, positions)
        if dirs is None:
            return p_out, None
        d = jnp.einsum("nij,nsj->nsi", r_t, dirs)
        return p_out, jnp.where(inside, d, dirs)

    def apply_c2w_inverse(self, rot_id: jax.Array, c2w: jax.Array) -> jax.Array:
        """World→canonical camera pose: the SDF object lives in the canonical
        frame, so the sensor for image i is R_i^{-1}·c2w (the reference's
        rotater.apply_mi_sensor, mitsuba_sdf.py:929-932)."""
        m = self.matrix(rot_id)
        r_t = jnp.swapaxes(m[..., :3, :3], -1, -2)
        r = jnp.einsum("...ij,...jk->...ik", r_t, c2w[..., :3, :3])
        t = jnp.einsum(
            "...ij,...j->...i", r_t, c2w[..., :3, 3] - m[..., :3, 3]
        )
        return jnp.concatenate([r, t[..., :, None]], axis=-1)

    def apply_rays_within(
        self,
        rot_id: jax.Array,
        origins: jax.Array,
        directions: jax.Array,
        bounding_radius: float | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Rotate rays (the reference's apply_frustums rotates the world
        only near the object — equivalently we rotate the RAY by the inverse
        so the rotation applies inside the bounding sphere)."""
        inv_id = rot_id
        m = self.matrix(inv_id)
        # inverse rigid transform
        r_t = jnp.swapaxes(m[..., :3, :3], -1, -2)
        o = jnp.einsum(
            "...ij,...j->...i", r_t, origins - m[..., :3, 3]
        )
        d = jnp.einsum("...ij,...j->...i", r_t, directions)
        if bounding_radius is None:
            return o, d
        # outside the bounding sphere, keep rays untouched
        inside = (
            jnp.linalg.norm(origins - self.center, axis=-1, keepdims=True)
            < bounding_radius
        )
        return jnp.where(inside, o, origins), jnp.where(inside, d, directions)


def unique_rotation_ids(rotation_tags) -> tuple[dict, list]:
    """Map raw per-image rotation tags to dense ids (reference rotater
    builds a tag->id table)."""
    uniq = sorted(set(int(r) for r in rotation_tags))
    table = {r: i for i, r in enumerate(uniq)}
    return table, [table[int(r)] for r in rotation_tags]
