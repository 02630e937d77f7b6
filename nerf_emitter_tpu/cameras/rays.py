"""Ray pytrees: RayBundle, Frustums, RaySamples.

TPU-native re-design of the reference's tensor dataclasses
(nerfstudio/cameras/rays.py). Everything is a `flax.struct` pytree with
static shapes so the whole sampling/rendering path traces once under jit.

The reference's `RayBundle.rotater` callable hook (rays.py:212,285-286) is
replaced by pure-function frustum rotation applied by the caller (see
fields/rotater.py) — pytrees carry data, not closures.

TPU layout rule: per-SAMPLE scalars are (n_rays, n_samples) — the sample
axis is the minor (lane) axis and tiles cleanly. A trailing singleton
(n_rays, n_samples, 1) puts 1 on the lane axis, which TPU tiling pads to
128 (128x memory/bandwidth whenever XLA materializes the buffer; measured
3.5 GB of HLO temps on a 2^16-ray emitter query before this rule).
Trailing-dim broadcasts happen at the point of use with `[..., None]`.
"""

from __future__ import annotations

from typing import Optional

import flax.struct as struct
import jax
import jax.numpy as jnp


@struct.dataclass
class Frustums:
    """Conical/rect frustums around ray samples.

    origins/directions: (n_rays, n_samples, 3) (broadcast views);
    starts/ends: (n_rays, n_samples) distances along the ray;
    pixel_area: (n_rays, n_samples) solid-angle footprint at unit distance.
    """

    origins: jax.Array
    directions: jax.Array
    starts: jax.Array
    ends: jax.Array
    pixel_area: jax.Array

    def get_positions(self) -> jax.Array:
        """Midpoint world positions: (..., 3)."""
        mid = (self.starts + self.ends) / 2.0
        return self.origins + self.directions * mid[..., None]

    def get_start_positions(self) -> jax.Array:
        return self.origins + self.directions * self.starts[..., None]

    def get_gaussian(self) -> tuple[jax.Array, jax.Array]:
        """(mean, isotropic variance) of a conical frustum section (mip-NeRF)."""
        mu = (self.starts + self.ends) / 2.0
        hw = (self.ends - self.starts) / 2.0
        mean_t = mu + (2.0 * mu * hw**2) / (3.0 * mu**2 + hw**2)
        var_t = (hw**2) / 3.0 - (4.0 / 15.0) * (
            (hw**4 * (12.0 * mu**2 - hw**2)) / (3.0 * mu**2 + hw**2) ** 2
        )
        r = jnp.sqrt(self.pixel_area / jnp.pi)
        var_r = r**2 * ((mu**2) / 4.0 + (5.0 / 12.0) * hw**2 - (4.0 / 15.0) * (hw**4) / (3.0 * mu**2 + hw**2))
        mean = self.origins + self.directions * mean_t[..., None]
        var = (var_t + var_r) / 2.0
        return mean, var


@struct.dataclass
class RaySamples:
    """Samples along rays. Per-sample scalars are (n_rays, n_samples)."""

    frustums: Frustums
    deltas: jax.Array  # (n_rays, n_samples)
    spacing_starts: jax.Array  # (n_rays, n_samples) in [0, 1] warped spacing
    spacing_ends: jax.Array
    camera_indices: Optional[jax.Array] = None  # (n_rays, 1) int32

    def get_weights(self, densities: jax.Array) -> jax.Array:
        """Volume-rendering weights from densities (n_rays, n_samples).

        w_i = T_i * (1 - exp(-sigma_i * delta_i)),  T_i = exp(-sum_{j<i} sigma_j delta_j)
        """
        delta_density = self.deltas * densities
        alphas = 1.0 - jnp.exp(-delta_density)
        trans = jnp.exp(-jnp.cumsum(delta_density[..., :-1], axis=-1))
        trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans], axis=-1)
        return alphas * trans

    @staticmethod
    def get_weights_and_transmittance_from_alphas(alphas: jax.Array) -> tuple[jax.Array, jax.Array]:
        trans = jnp.cumprod(
            jnp.concatenate([jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-7], axis=-1),
            axis=-1,
        )[..., :-1]
        return alphas * trans, trans


@struct.dataclass
class RayBundle:
    """A batch of rays. All leading dims identical; last dim as noted."""

    origins: jax.Array  # (..., 3)
    directions: jax.Array  # (..., 3) unit norm
    pixel_area: jax.Array  # (..., 1)
    nears: jax.Array  # (..., 1)
    fars: jax.Array  # (..., 1)
    camera_indices: Optional[jax.Array] = None  # (..., 1) int32
    valid: Optional[jax.Array] = None  # (..., 1) bool — padding mask

    @property
    def num_rays(self) -> int:
        return int(jnp.size(self.origins) // 3)

    def reshape(self, shape) -> "RayBundle":
        def rs(x, last):
            return None if x is None else x.reshape(*shape, last)

        return RayBundle(
            origins=rs(self.origins, 3),
            directions=rs(self.directions, 3),
            pixel_area=rs(self.pixel_area, 1),
            nears=rs(self.nears, 1),
            fars=rs(self.fars, 1),
            camera_indices=rs(self.camera_indices, 1),
            valid=rs(self.valid, 1),
        )

    def flatten(self) -> "RayBundle":
        return self.reshape((-1,))

    def get_ray_samples(
        self,
        bin_starts: jax.Array,
        bin_ends: jax.Array,
        spacing_starts: jax.Array,
        spacing_ends: jax.Array,
    ) -> RaySamples:
        """Build RaySamples from per-ray euclidean bins (n_rays, n_samples)."""
        deltas = bin_ends - bin_starts
        n_samples = bin_starts.shape[-1]
        broadcast = lambda x, d: jnp.broadcast_to(
            x[..., None, :], (*x.shape[:-1], n_samples, d)
        )
        frustums = Frustums(
            origins=broadcast(self.origins, 3),
            directions=broadcast(self.directions, 3),
            starts=bin_starts,
            ends=bin_ends,
            pixel_area=jnp.broadcast_to(self.pixel_area, bin_starts.shape),
        )
        cam_idx = None
        if self.camera_indices is not None:
            cam_idx = self.camera_indices
        return RaySamples(
            frustums=frustums,
            deltas=deltas,
            spacing_starts=spacing_starts,
            spacing_ends=spacing_ends,
            camera_indices=cam_idx,
        )
