"""The NeRF-as-emitter pipeline: two-phase training with the radiance field
serving as the environment emitter of the SDF renderer.

Re-design of MitsubaSdfPipeline (nerfstudio/pipelines/mitsuba_sdf.py:242-
1318) and the diff-sdf emitter bridge (emitters/nerf.py +
nerf_emitter_op.py dr.CustomOp): the cross-framework, cross-process RPC —
broadcast target size, pad_scatter (o,v) over NCCL, torch chunked forward,
pad_gather back into Dr.Jit, with RNG-state replay for the backward — is
replaced by FUNCTION COMPOSITION: the emitter is a closure that evaluates
the nerfacto model inside the SDF render step; jax.grad differentiates
through renderer AND field in one program; multi-chip is a sharding
constraint on the flat emitter-ray batch.

Phase schedule (reference method_configs.py:288-345):
  step < takeover_step (2000): NeRF pretrain (engine.train_loop)
  step >= takeover_step: per-step SDF optimization with NeRF emitter
    + optional joint NeRF update, guiding rebuild every 10 mi-steps,
    TSDF init at takeover, LR x0.01 drop on field/proposal groups.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..cameras.rays import RayBundle
from ..data.datamanager import ImageDataset
from ..engine.train_loop import TrainConfig, TrainState, make_render_fn, make_train_step
from ..guiding.path_guiding import VMFGuiding
from ..models.nerfacto import NerfactoModel
from ..ops.colliders import aabb_far_intersect_collider
from ..renderer.integrator import RenderConfig
from ..renderer.optimize import SdfOptConfig
from ..renderer.scene import SdfScene
from ..utils import coords
from .sdf_optimizer import (
    SdfOptState,
    TakeoverConfig,
    build_sdf_optimizer,
    make_sdf_train_step,
    post_step_host,
)


def make_nerf_emitter_fn(
    model: NerfactoModel,
    scene_scale: float,
    object_aabb: jax.Array,
    *,
    far: float = 1e3,
    detach_nerf: bool = False,
    rotater=None,
    use_fused: bool = True,
):
    """Returns emitter_fn_of(params, camera_index=None, rot_id=None) ->
    (x_unit, d) -> radiance.

    Emitter-query semantics match the reference bridge:
    - rays escape the object region: they start at the object-bbox EXIT
      (AABBBoxFarIntersectCollider, scene_colliders.py far_intersect),
    - NeRF density inside the object box is disabled (the carve-out),
    - `detach_nerf` mirrors `detach_op` (emitter radiance treated as a
      constant for the SDF adjoint; NeRF gets no gradient),
    - `camera_index` drives the appearance embedding / rotation id that the
      reference broadcasts via scatter_camera_idx,
    - `rotater` + `rot_id` map the canonical object-frame query ray into the
      world (light) frame for turntable captures (the reference's
      rotater.apply_sdf_scene / nerfemitter set_camera_idx,
      rotater.py:122-123),
    - `use_fused` (freq implementation only): serve the query through the
      megafused Pallas kernels (ops/mega_query.py — the whole proposal +
      field pipeline in two kernels, ~3x over the plain XLA path);
      gradients recompute through the plain path (custom_vjp).
    """
    fused_query = None
    # TPU-backend gate: off-TPU the kernels would run in interpret mode
    # (slow), and under auto-partitioning a pallas_call is an opaque custom
    # call XLA cannot shard — the multi-chip path keeps the plain XLA query
    # until the kernels are wrapped in shard_map over the ray axis.
    if (
        use_fused
        and getattr(model, "implementation", "") == "freq"
        and jax.default_backend() == "tpu"
    ):
        import numpy as _np

        from ..ops.mega_query import make_mega_radiance_query

        _box = _np.asarray(object_aabb, _np.float32)
        fused_query = make_mega_radiance_query(
            model, disable_box=tuple(tuple(float(x) for x in row) for row in _box)
        )

    def emitter_fn_of(params, camera_index=None, rot_id=None):
        p = jax.lax.stop_gradient(params) if detach_nerf else params

        def emitter_fn(x_unit: jax.Array, d: jax.Array) -> jax.Array:
            o_w = coords.unit_to_world(x_unit, scene_scale)
            dd = d
            n = o_w.shape[0]
            cam = (
                jnp.broadcast_to(camera_index, (n, 1)).astype(jnp.int32)
                if camera_index is not None
                else jnp.zeros((n, 1), jnp.int32)
            )
            rays = RayBundle(
                origins=o_w,
                directions=dd,
                pixel_area=jnp.full((n, 1), 1e-4),
                nears=jnp.zeros((n, 1)),
                fars=jnp.full((n, 1), far),
                camera_indices=cam,
            )
            # object-box exit computed in the CANONICAL frame (the box lives
            # there); near/far are distances along the ray, invariant under
            # the subsequent rigid canonical->world rotation
            rays = aabb_far_intersect_collider(rays, object_aabb, far=far)
            if rotater is not None and rot_id is not None:
                rid = jnp.broadcast_to(rot_id, (n,)).astype(jnp.int32)
                rays = rays.replace(
                    origins=rotater.apply_points(rid, rays.origins),
                    directions=rotater.apply_dirs(rid, rays.directions),
                )
            if fused_query is not None:
                return fused_query(p, rays, camera_index=camera_index)
            out = model.apply(
                p,
                rays,
                train=False,
                hdr_radiance_only=True,
                disable_aabb=object_aabb,
                disable_aabb_on=True,
            )
            return out["rgb"]

        return emitter_fn

    return emitter_fn_of


@dataclasses.dataclass
class NerfEmitterPipelineConfig:
    """The sdf-nerfacto method surface (MitsubaSdfPipelineConfig's ~70 flags
    reduced to the ones that change behavior; reference
    mitsuba_sdf.py:73-239 + method_configs.py:288-345)."""

    takeover_step: int = 2000
    mi_opt_steps: int = 320
    scene_scale: float = 1.0
    object_aabb: tuple = ((-0.3, -0.3, -0.3), (0.3, 0.3, 0.3))
    guiding_type: str = "vmf"  # 'vmf' | 'env' | 'emitter_xml'
    proposal_rebuild_every: int = 10
    tsdf_init_res: int = 128
    tsdf_depth_downscale: int = 4
    no_update_nerf: bool = True  # freeze NeRF during takeover (detach_op)
    batch_size: int = 4  # images per mi step
    spp: int = 32
    takeover_image_size: int = 64
    sdf_init: str = "tsdf"  # 'tsdf' (from NeRF depth) | 'sphere'
    env_path: Optional[str] = None  # GT envmap for guiding_type='env'
    # hide_emitters=False renders the emitter behind the object (synthetic
    # scenes: pred background == NeRF's environment == GT background);
    # True (real scenes) leaves the background to occlusion compositing.
    hide_emitters: bool = False
    # real captures: render NeRF occlusion/background layers once at
    # takeover and composite them into every takeover render (reference
    # render_internal_mask/render_occlusion, mitsuba_sdf.py:607-681)
    use_occlusion: bool = False
    rotation_radius: float = 0.6  # turntable sphere around the object
    # MIS strategy of the SDF integrator (renderer/integrator.RenderConfig):
    # 'one_sample' halves the NeRF-emitter queries per camera ray — the
    # reference's onesamplemis and the right choice when the emitter is the
    # NeRF; 'both' (deterministic MIS) for low-spp / envmap runs.
    mis_mode: str = "one_sample"
    # Silhouette-gradient treatment of TAKEOVER renders. 'soft' (default):
    # soft-visibility + mask loss — at this pipeline's spp (<=32) the warp
    # estimator's divergence spikes measurably stall convergence (TPU A/B,
    # spp 4: last5/first 0.34 soft vs 0.67 warp) and the warp triples the
    # trace cost. 'warp' (+ warp_secondary): the reference's warponemis —
    # the principled choice at Mitsuba-scale spp (256) or without masks.
    reparam: str = "soft"
    warp_secondary: bool = False


class NerfEmitterPipeline:
    """Host-side orchestrator. All hot paths are jitted pure functions; this
    class only sequences phases and owns the (pytree) states."""

    def __init__(
        self,
        config: NerfEmitterPipelineConfig,
        model: NerfactoModel,
        train_config: TrainConfig,
        opt_config: SdfOptConfig,
        dataset: ImageDataset,
        mi_dataset: Optional[ImageDataset] = None,
        render_config: RenderConfig = RenderConfig(),
        rotater=None,
    ):
        self.config = config
        self.model = model
        self.rotater = rotater
        self.train_config = dataclasses.replace(
            train_config,
            step_pretrain=config.takeover_step,
            rotation_radius=config.rotation_radius,
        )
        self.opt_config = opt_config
        self.dataset = dataset
        self.mi_dataset = mi_dataset if mi_dataset is not None else dataset
        self.render_config = dataclasses.replace(
            render_config,
            mis_mode=config.mis_mode,
            reparam=config.reparam,
            warp_secondary=config.warp_secondary,
        )

        self.object_aabb = jnp.asarray(config.object_aabb, jnp.float32)
        self.guiding = VMFGuiding(
            rebuild_every=config.proposal_rebuild_every,
            scene_scale=config.scene_scale,
        )

        # NeRF side
        from ..engine.train_loop import create_train_state

        example_rays = dataset.cameras.generate_rays(
            jnp.zeros((4,), jnp.int32),
            jnp.zeros((4, 2), jnp.int32),
            nears=train_config.near,
            fars=train_config.far,
        )
        self.nerf_state, self.nerf_tx = create_train_state(
            model, self.train_config, example_rays, jax.random.PRNGKey(0)
        )
        self.nerf_step_fn = make_train_step(
            model, self.train_config, self.nerf_tx, rotater=rotater
        )
        self.render_fn = make_render_fn(
            model, self.train_config,
            rotater=rotater, camera_rot_ids=dataset.rotation_ids,
        )

        # SDF side (created lazily at takeover)
        self.sdf_state: Optional[SdfOptState] = None
        self.sdf_tx = None
        self.sdf_step_fn = None
        self.occlusion = None
        self._emitter_fn_of = make_nerf_emitter_fn(
            model,
            config.scene_scale,
            self.object_aabb,
            detach_nerf=config.no_update_nerf,
            rotater=rotater,
        )

    # ---------------------------------------------------------- NeRF phase
    def nerf_iteration(self, key: jax.Array):
        self.nerf_state, metrics = self.nerf_step_fn(self.nerf_state, self.dataset, key)
        return metrics

    # ------------------------------------------------------- takeover init
    def tsdf_init(self) -> SdfScene:
        """Render NeRF depth from the training cameras and fuse into the
        initial SDF (reference tsdf_init, mitsuba_sdf.py:563-605 +
        TSDF.from_aabb over the OBJECT box, exporter/tsdf_utils.py).

        Depth rays are clipped to the object AABB so environment geometry
        (including NeRF 'fog' shells from the shape-radiance ambiguity —
        view-dependent color makes a fog sphere photometrically perfect for
        a distant env) cannot pollute the fusion; rays whose in-box
        accumulation is low carry no surface and are marked free."""
        from ..data.scene_box import CropMode, SceneBox
        from .tsdf import tsdf_init_sdf

        cams = self.dataset.cameras
        d = self.config.tsdf_depth_downscale
        from ..cameras.cameras import Cameras

        small = Cameras(
            camera_to_worlds=cams.camera_to_worlds,
            fx=cams.fx / d, fy=cams.fy / d, cx=cams.cx / d, cy=cams.cy / d,
            width=cams.width // d, height=cams.height // d,
        )
        obj_box = SceneBox(aabb=self.object_aabb, crop_mode=CropMode.NORMAL)
        depths = []
        n_cams = min(len(small), 32)
        for i in range(n_cams):
            out = self.render_fn(
                self.nerf_state.params, small, jnp.int32(i),
                small.height, small.width, aabb_box=obj_box,
            )
            # low in-box opacity = the ray saw no object surface -> free
            solid = out["accumulation"] > 0.3
            depths.append(jnp.where(solid, out["depth"], 1e3))
        depth_images = jnp.stack(depths)
        sdf = tsdf_init_sdf(
            Cameras(
                camera_to_worlds=small.camera_to_worlds[:n_cams],
                fx=small.fx[:n_cams], fy=small.fy[:n_cams],
                cx=small.cx[:n_cams], cy=small.cy[:n_cams],
                width=small.width, height=small.height,
            ),
            depth_images,
            res=self.config.tsdf_init_res,
            scene_scale=self.config.scene_scale,
            object_aabb=self.object_aabb,
        )
        # crop to the opt resolution
        from ..renderer.grid3d import sphere_sdf_grid, upsample_grid

        sdf = upsample_grid(sdf, self.opt_config.init_res)
        if float(jnp.min(sdf)) >= 0.0:
            # degenerate fusion (no interior) -> sphere fallback, like the
            # reference's cube-override escape hatch (mitsuba_sdf.py:852-876)
            print("tsdf_init: degenerate fusion, falling back to sphere init")
            sdf = sphere_sdf_grid(self.opt_config.init_res, radius=0.25)
        return SdfScene(
            sdf=sdf,
            albedo=jnp.full(
                (self.opt_config.tex_res,) * 3 + (3,), 0.5
            ),
            roughness=jnp.full((self.opt_config.tex_res,) * 3 + (1,), 0.5),
            bsdf_type=self.opt_config.bsdf_type,
            hide_emitters=self.config.hide_emitters,
        )

    def begin_takeover(self, key: jax.Array, scene: Optional[SdfScene] = None):
        use_env = self.config.guiding_type in ("env", "emitter_xml")
        if scene is None:
            if self.config.sdf_init == "tsdf" and not use_env:
                scene = self.tsdf_init()
            else:
                # sdf-gt-envmap path: no NeRF to fuse from — sphere init
                scene = SdfScene.create(
                    sdf_res=self.opt_config.init_res,
                    tex_res=self.opt_config.tex_res,
                    bsdf_type=self.opt_config.bsdf_type,
                )
                scene = scene.replace(hide_emitters=self.config.hide_emitters)
        if use_env:
            # GT-envmap emitter doubles as the sampling proposal (reference
            # EnvironmentGuiding / sdf-gt-envmap, method_configs.py:347-380)
            from ..guiding.path_guiding import EnvGuiding

            env = EnvGuiding(
                env_path=self.config.env_path
            ).build_envmap(getattr(self, "data_dir", "."))
            scene = scene.replace(envmap=env, guiding=None)
            emitter_fn = None  # radiance comes from scene.envmap
        emitter_for_camera = None
        if not use_env:
            scene = self.build_emitter_proposal(key, scene)
            emitter_fn = self._emitter_fn_of(self.nerf_state.params)
            # per-image closure: appearance embedding + turntable rotation
            # (the reference's scatter_camera_idx broadcast + apply_sdf_scene)
            emitter_for_camera = lambda cam_idx, rot_id: self._emitter_fn_of(
                self.nerf_state.params, camera_index=cam_idx, rot_id=rot_id
            )
        # occlusion/background layers rendered ONCE at takeover (reference
        # render_internal_mask/render_occlusion, mitsuba_sdf.py:607-681)
        if self.config.use_occlusion:
            from ..data.occlusion import render_occlusion_layers

            cams = self.mi_dataset.cameras
            d = max(1, int(cams.height) // self.config.takeover_image_size)
            from ..cameras.cameras import Cameras

            small = Cameras(
                camera_to_worlds=cams.camera_to_worlds,
                fx=cams.fx / d, fy=cams.fy / d, cx=cams.cx / d, cy=cams.cy / d,
                width=cams.width // d, height=cams.height // d,
            )
            self.occlusion = render_occlusion_layers(
                lambda p, c, i, aabb_box=None: self.render_fn(
                    p, c, i, c.height, c.width, aabb_box=aabb_box
                ),
                self.nerf_state.params,
                small,
                self.object_aabb,
            )
        self.sdf_tx = build_sdf_optimizer(self.opt_config)
        self.sdf_state = SdfOptState(
            step=jnp.int32(0), scene=scene, opt_state=self.sdf_tx.init(scene)
        )
        takeover = TakeoverConfig(
            spp=self.config.spp,
            image_height=self.config.takeover_image_size,
            image_width=self.config.takeover_image_size,
            scene_scale=self.config.scene_scale,
        )
        self._serving_emitter_fn = emitter_fn
        self.sdf_step_fn = make_sdf_train_step(
            self.opt_config, takeover, self.sdf_tx,
            emitter_fn=emitter_fn, render_config=self.render_config,
            emitter_for_camera=emitter_for_camera,
            rotater=self.rotater,
            camera_rot_ids=self.mi_dataset.rotation_ids,
            use_occlusion=self.occlusion is not None,
        )

    def build_emitter_proposal(self, key: jax.Array, scene: SdfScene) -> SdfScene:
        """Refresh the vMF guiding mixture from the current NeRF (reference
        build_emitter_proposal, every 10 mi-steps)."""
        vmf = self.guiding.build(
            key,
            self.model,
            self.nerf_state.params,
            self.dataset.cameras,
            object_aabb=self.object_aabb,
        )
        return scene.replace(guiding=vmf)

    # ---------------------------------------------------- takeover iteration
    def takeover_iteration(self, key: jax.Array):
        assert self.sdf_state is not None, "call begin_takeover first"
        mi_step = int(self.sdf_state.step)
        use_env = self.config.guiding_type in ("env", "emitter_xml")
        if not use_env and self.guiding.should_rebuild(mi_step):
            k1, key = jax.random.split(key)
            scene = self.build_emitter_proposal(k1, self.sdf_state.scene)
            self.sdf_state = self.sdf_state.replace(scene=scene)

        ds = self.mi_dataset
        n = ds.images.shape[0]
        k_pick, k_step = jax.random.split(key)
        cam_idx = jax.random.choice(
            k_pick, n, (self.config.batch_size,), replace=False
        )
        gt = ds.images[cam_idx]
        masks = (
            ds.masks[cam_idx]
            if ds.masks is not None
            else jnp.ones((*gt.shape[:3], 1))
        )
        if self.occlusion is not None:
            occ = (
                self.occlusion.occlusion_rgb[cam_idx],
                self.occlusion.occlusion_mask[cam_idx],
                self.occlusion.background_rgb[cam_idx],
            )
            self.sdf_state, metrics = self.sdf_step_fn(
                self.sdf_state, ds.cameras, cam_idx, gt, masks, k_step, occ
            )
        else:
            self.sdf_state, metrics = self.sdf_step_fn(
                self.sdf_state, ds.cameras, cam_idx, gt, masks, k_step
            )
        self.sdf_state = post_step_host(self.sdf_state, self.opt_config, self.sdf_tx)
        return metrics

    # ------------------------------------------------------------- serving
    def render_camera_outputs(
        self,
        dataset: ImageDataset,
        cam_index: int,
        key: jax.Array,
        spp: int = 64,
    ) -> dict:
        """Novel-view render (reference render_camera_outputs,
        mitsuba_sdf.py:1042-1080): SDF renderer with the NeRF emitter when
        the takeover has begun, plain NeRF render otherwise."""
        cams = dataset.cameras
        if self.sdf_state is None:
            out = self.render_fn(
                self.nerf_state.params, cams, jnp.int32(cam_index),
                cams.height, cams.width,
            )
            return out
        use_nerf_emitter = (
            getattr(self, "_serving_emitter_fn", None) is not None
            or self.config.guiding_type == "vmf"
        )
        h, w = cams.height, cams.width

        cache_key = (h, w, spp, use_nerf_emitter, dataset.rotation_ids is not None)
        if getattr(self, "_serve_cache_key", None) != cache_key:
            from ..renderer.integrator import render_spp
            from ..renderer.sensors import camera_rays_in_render_space

            # NeRF params enter as a jit ARGUMENT (a closure would embed
            # them as compile-time constants and go stale on updates)
            rotater = self.rotater
            rot_ids = dataset.rotation_ids

            @jax.jit
            def _serve(scene, cameras, cam_index, k, nerf_params):
                rid = (
                    rot_ids[cam_index]
                    if (rotater is not None and rot_ids is not None)
                    else None
                )
                emitter = (
                    self._emitter_fn_of(
                        nerf_params, camera_index=cam_index, rot_id=rid
                    )
                    if use_nerf_emitter
                    else None
                )
                o, d = camera_rays_in_render_space(
                    cameras, cam_index, h, w, self.config.scene_scale,
                    rotater=rotater, rot_id=rid,
                )
                # serving is gradient-free: the warp reparameterization
                # changes nothing in the primal, so skip its 3x trace cost
                serve_cfg = dataclasses.replace(
                    self.render_config, reparam="soft"
                )
                return render_spp(
                    scene, o, d, k, spp,
                    emitter_fn=emitter, config=serve_cfg,
                )

            self._serve_fn = _serve
            self._serve_cache_key = cache_key
        out = self._serve_fn(
            self.sdf_state.scene, cams, jnp.int32(cam_index), key,
            self.nerf_state.params,
        )
        return {
            "rgb": out["rgb"].reshape(h, w, 3),
            "depth": out["depth"].reshape(h, w, 1),
            "accumulation": out["soft_mask"].reshape(h, w, 1),
        }

    def get_average_eval_image_metrics(
        self, dataset: ImageDataset, key: jax.Array, spp: int = 64,
        get_std: bool = False,
    ) -> dict:
        """Averaged PSNR/SSIM/MAPE over an eval split (reference
        get_average_eval_image_metrics override, mitsuba_sdf.py:1235-1318)."""
        from ..engine.train_loop import eval_image_metrics

        all_m: dict[str, list] = {}
        for i in range(dataset.images.shape[0]):
            key, k = jax.random.split(key)
            out = self.render_camera_outputs(dataset, i, k, spp=spp)
            m = eval_image_metrics(out["rgb"], dataset.images[i], is_hdr=dataset.is_hdr)
            for name, v in m.items():
                all_m.setdefault(name, []).append(float(jnp.asarray(v)))
        result = {name: float(jnp.mean(jnp.asarray(v))) for name, v in all_m.items()}
        if get_std:
            result.update(
                {
                    f"{name}_std": float(jnp.std(jnp.asarray(v)))
                    for name, v in all_m.items()
                }
            )
        return result

    # ----------------------------------------------------------- top level
    def train_iteration(self, step: int, key: jax.Array):
        """One training step of the two-phase schedule (reference
        Trainer.train_iteration branches, engine/trainer.py:488-540)."""
        if step < self.config.takeover_step:
            return self.nerf_iteration(key)
        if self.sdf_state is None:
            self.begin_takeover(key)
        return self.takeover_iteration(key)
