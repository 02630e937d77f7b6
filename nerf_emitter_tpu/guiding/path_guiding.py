"""Path-guiding strategies: vMF (NeRF-driven), environment, emitter-XML.

Re-design of nerfstudio/path_guiding/ (SURVEY.md §2.1 #6-#8):
- registry 'vmf' | 'env' | 'emitter_xml' -> strategy
  (path_guiding/__init__.py:8-16)
- VonMisesFisherGuiding (vmf_guiding.py:21-118): extract the light point
  cloud from the NeRF -> mean-compensate & threshold -> fit a 64-component
  spherical GMM -> load (position, weight, std) into a vMF mixture emitter
  proposal; rebuilt every N mi-steps.
- EnvironmentGuiding (env_guiding.py): ground-truth envmap from the dataset
  (sampling proposal AND radiance for sdf-gt-envmap).
- EmitterXML -> here 'emitter_image': an arbitrary relighting envmap image.

A strategy is a small stateless object whose `build` returns updated scene
emitter/guiding pytree leaves — no mutable Mitsuba params to traverse.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

from ..renderer.emitters import EnvmapEmitter, VMFMixture
from ..utils import coords
from .gmm import fit_spherical_gmm
from .light_pc import compensate_pc, extract_light_point_cloud

N_CLUSTER = 64


@dataclasses.dataclass
class VMFGuiding:
    """NeRF-emitter importance sampling via a vMF mixture."""

    n_clusters: int = N_CLUSTER
    max_points: int = 32768
    downscale: int = 4
    use_spherical_rig: bool = False
    rebuild_every: int = 10  # mi-steps (reference proposal cadence)
    scene_scale: float = 1.0  # world [-s,s] -> unit cube mapping
    # MIS compensation (reference guiding_mis_compensation,
    # mitsuba_sdf.py:176,351): fit the proposal to the luminance EXCESS
    # over the mean — the broad mean component is already covered by the
    # BSDF sampling strategy of the MIS pair, so the guiding mixture
    # should only chase concentrated lights (Karlik et al. 2019 style).
    # Off: fit raw luminance (the proposal also covers diffuse sky).
    mis_compensation: bool = True

    def build(
        self,
        key: jax.Array,
        model,
        params,
        cameras,
        object_aabb: Optional[jax.Array] = None,
    ) -> VMFMixture:
        pc = extract_light_point_cloud(
            model,
            params,
            cameras,
            object_aabb=object_aabb,
            downscale=self.downscale,
            use_spherical_rig=self.use_spherical_rig,
        )
        pts, w = compensate_pc(
            pc["points"], pc["luminance"], self.max_points,
            mean_mult=1.0 if self.mis_compensation else 0.0,
        )
        # world -> render space (the emitter proposal lives with the SDF)
        pts_unit = coords.world_to_unit(pts, self.scene_scale)
        means, pis, stds = fit_spherical_gmm(key, pts_unit, w, self.n_clusters)
        # positional std -> angular std happens at sampling time (the vMF
        # emitter stores positions; kappa from std via distance), matching
        # the reference's (position, weight, std) triplet.
        return VMFMixture(positions=means, weights=pis, stds=jnp.maximum(stds, 1e-3))

    def should_rebuild(self, mi_step: int) -> bool:
        return mi_step % self.rebuild_every == 0


@dataclasses.dataclass
class EnvGuiding:
    """Ground-truth envmap proposal (sdf-gt-envmap baseline): load env.exr
    from the dataset dir."""

    env_path: Optional[Path] = None

    def build_envmap(self, data_dir: Path) -> EnvmapEmitter:
        import numpy as np

        from ..utils import exr

        path = Path(self.env_path) if self.env_path else Path(data_dir) / "env.exr"
        if path.suffix == ".npy":
            img = np.load(path)
        else:
            img = exr.read_exr(path)
        return EnvmapEmitter.create(jnp.asarray(img[..., :3]))


@dataclasses.dataclass
class EmitterImageGuiding:
    """Arbitrary relighting emitter (the reference's emitter_xml guiding):
    any envmap image file swapped in at eval time."""

    emitter_path: Path = Path("env.exr")

    def build_envmap(self) -> EnvmapEmitter:
        import numpy as np

        from ..utils import exr

        p = Path(self.emitter_path)
        img = np.load(p) if p.suffix == ".npy" else exr.read_exr(p)
        return EnvmapEmitter.create(jnp.asarray(img[..., :3]))


GUIDING_REGISTRY = {
    "vmf": VMFGuiding,
    "env": EnvGuiding,
    "emitter_xml": EmitterImageGuiding,  # name kept for CLI compat
}
