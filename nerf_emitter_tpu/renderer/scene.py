"""SdfScene: the differentiable scene pytree.

Replaces the reference's Mitsuba XML scene templates + mi.traverse parameter
dict (diff-sdf assets/sdf_scene.xml, constants.py SDF_DEFAULT_KEY /
ENV_DEFAULT_KEY — SURVEY.md §2.3): the scene IS a pytree of voxel grids and
emitter state; "traversal" is attribute access; optimizers update leaves
with optax.
"""

from __future__ import annotations

from typing import Optional

import flax.struct as struct
import jax
import jax.numpy as jnp

from .emitters import EnvmapEmitter, VMFMixture
from .grid3d import sphere_sdf_grid

DIFFUSE = 0
PRINCIPLED = 1


@struct.dataclass
class SdfScene:
    """All quantities live in the unit cube [0,1]^3 (render space).

    sdf: (R, R, R, 1); albedo: (Ra, Ra, Ra, 3); roughness: (Rr, Rr, Rr, 1).
    envmap: optional environment emitter (the GT-envmap baseline and
    relighting); when the NeRF is the emitter, radiance comes from the
    emitter callable passed to the integrator instead.
    """

    sdf: jax.Array
    albedo: jax.Array
    roughness: jax.Array
    envmap: Optional[EnvmapEmitter] = None
    guiding: Optional[VMFMixture] = None
    bsdf_type: int = struct.field(pytree_node=False, default=DIFFUSE)
    hide_emitters: bool = struct.field(pytree_node=False, default=False)

    @staticmethod
    def create(
        sdf_res: int = 64,
        tex_res: int = 32,
        bsdf_type: int = DIFFUSE,
        envmap: Optional[EnvmapEmitter] = None,
        init_albedo: float = 0.5,
        init_roughness: float = 0.5,
        init_radius: float = 0.3,
    ) -> "SdfScene":
        return SdfScene(
            sdf=sphere_sdf_grid(sdf_res, radius=init_radius),
            albedo=jnp.full((tex_res, tex_res, tex_res, 3), init_albedo),
            roughness=jnp.full((tex_res, tex_res, tex_res, 1), init_roughness),
            envmap=envmap,
            bsdf_type=bsdf_type,
        )
