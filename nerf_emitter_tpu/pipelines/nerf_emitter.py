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


def _shard_fused_query(fused_query, mesh, data_axis: str):
    """Wrap the megafused Pallas query in shard_map over the flat ray axis.

    Each device runs the two megakernels on its own ray shard; NeRF params
    are replicated (in_spec P()) so their cotangents are psum'd by the
    shard_map transpose — the SPMD equivalent of the reference's
    pad_scatter (o,v) / pad_gather radiance emitter protocol
    (mitsuba_sdf.py:878-912) with zero hand-written collectives."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[data_axis]
    spec = P(data_axis, None)

    def query(params, rays, camera_index=None):
        n = rays.origins.shape[0]
        pad = (-n) % n_dev
        if pad:
            def pad0(x, fill=0.0):
                return jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)

            rays = RayBundle(
                origins=pad0(rays.origins),
                directions=pad0(rays.directions, 1.0),
                pixel_area=pad0(rays.pixel_area, 1e-4),
                nears=pad0(rays.nears, 0.1),
                fars=pad0(rays.fars, 0.2),
                camera_indices=(
                    pad0(rays.camera_indices, 0)
                    if rays.camera_indices is not None else None
                ),
            )
        cam = jnp.asarray(
            camera_index if camera_index is not None else 0, jnp.int32
        )
        ray_specs = jax.tree.map(lambda _: spec, rays)
        out = shard_map(
            lambda p_, rb_, c_: fused_query(p_, rb_, camera_index=c_),
            mesh=mesh,
            in_specs=(P(), ray_specs, P()),
            out_specs=spec,
            check_rep=False,
        )(params, rays, cam)
        return out[:n]

    return query


def make_nerf_emitter_fn(
    model: NerfactoModel,
    scene_scale: float,
    object_aabb: jax.Array,
    *,
    far: float = 1e3,
    detach_nerf: bool = False,
    rotater=None,
    use_fused: bool = True,
    mesh=None,
    data_axis: Optional[str] = None,
    samples_override: Optional[tuple] = None,
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
      gradients recompute through the plain path (custom_vjp),
    - `samples_override` = (proposal_0, proposal_1, nerf) replaces the
      model's per-ray sample schedule FOR THE EMITTER QUERY ONLY (params
      are shared; sample counts shape the sampling ops, not the weights).
      The reference always queries at the primary-view schedule
      (base_model.py:292-313); on TPU the query cost is linear in the
      sample budget while the emitter radiance is integrated over >=64
      spp, so halving the schedule trades invisible per-ray variance for
      ~2x query throughput — a TPU-first knob, default off.
    """
    if samples_override is not None:
        p0, p1, ns = samples_override
        for s in (p0, p1, ns):
            if s % 8 != 0:
                # intentional headroom, not a kernel requirement (mega tests
                # run s2=6): 8-aligned counts keep every (samples, rays) row
                # block sublane-aligned on all schedules we ship
                raise ValueError(
                    f"emitter sample counts must be multiples of 8, got "
                    f"{samples_override}"
                )
        model = model.clone(
            num_proposal_samples=(int(p0), int(p1)),
            num_nerf_samples=int(ns),
        )
    fused_query = None
    # TPU-backend gate: off-TPU the kernels would run in interpret mode
    # (slow). Under a mesh the pallas_calls are wrapped in shard_map over
    # the flat ray axis (each chip runs the megakernels on its ray shard —
    # the reference's pad_scatter/pad_gather, mitsuba_sdf.py:878-912, as
    # one collective-free SPMD region); without shard_map a pallas_call is
    # an opaque custom call XLA's auto-partitioner cannot shard.
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
        if mesh is not None and data_axis is not None:
            fused_query = _shard_fused_query(fused_query, mesh, data_axis)

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
    # mi-step at which parameter running means replace the live volumes
    # (reference load_mean_step=PRETRAIN+MI_OPT-1=2319, expressed here
    # relative to takeover; None = mi_opt_steps-1; -1 disables)
    load_mean_step: Optional[int] = None
    scene_scale: float = 1.0
    object_aabb: tuple = ((-0.3, -0.3, -0.3), (0.3, 0.3, 0.3))
    guiding_type: str = "vmf"  # 'vmf' | 'env' | 'emitter_xml'
    proposal_rebuild_every: int = 10
    tsdf_init_res: int = 128
    tsdf_depth_downscale: int = 4
    no_update_nerf: bool = True  # freeze NeRF during takeover (detach_op)
    batch_size: int = 4  # images per mi step
    spp: int = 32
    # aggregate-estimator threshold (reference primal_spp_mult semantics,
    # mi_util.py:22-56): when spp > spp_attached, the primal is the full-spp
    # mean in detached bounded dispatches and the gradient flows through
    # spp_attached samples; 0 = always exact single-dispatch gradients
    spp_attached: int = 16
    # (proposal_0, proposal_1, nerf) per-ray sample schedule for the
    # NeRF-as-emitter query only; None = the model's primary-view schedule
    # (reference parity). E.g. (128, 48, 24) halves query cost for
    # per-ray variance that the >=64-spp emitter integral absorbs.
    emitter_samples: Optional[tuple] = None
    # mi-step at which the Polyak mean starts accumulating; None = cover the
    # last 64 steps (mean over the whole diverging/settling trajectory from
    # takeover was measurably worse than the tail mean)
    mean_start: Optional[int] = None
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
    # Distill the frozen NeRF emitter into a light-field MLP cache at
    # takeover (serving/distill.py): one ~1M-MAC MXU evaluation per query
    # instead of the full ~13M-MAC sampled evaluation. detach semantics,
    # appearance embeddings and turntable rotations are preserved; the
    # proposal/guiding rebuild keeps querying the full NeRF. Default off
    # until the takeover-quality A/B gates it (same protocol as
    # emitter_samples).
    distill_emitter: bool = False
    distill_steps: int = 2000


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
        mesh=None,
        data_axis: Optional[str] = None,
    ):
        self.config = config
        self.model = model
        self.rotater = rotater
        self.mesh = mesh
        self.data_axis = data_axis if mesh is not None else None
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
            mis_compensation=self.render_config.guiding_mis_compensation,
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
        if self.mesh is not None:
            # jit-init commits arrays to one device; mesh-constrained
            # programs (render_fn/serve/step) need mesh-replicated inputs
            from ..parallel.mesh import replicated

            self.nerf_state = jax.device_put(
                self.nerf_state, replicated(self.mesh)
            )
        self.nerf_step_fn = make_train_step(
            model, self.train_config, self.nerf_tx, rotater=rotater,
            mesh=self.mesh,
        )
        self.render_fn = make_render_fn(
            model, self.train_config,
            rotater=rotater, camera_rot_ids=dataset.rotation_ids,
            mesh=self.mesh, data_axis=self.data_axis,
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
            mesh=self.mesh,
            data_axis=self.data_axis,
            samples_override=config.emitter_samples,
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
                # sdf-gt-envmap path: no NeRF to fuse from — sphere init,
                # sized to the OBJECT box. The old fixed radius (0.3 of the
                # unit cube) filled the entire view from close-in captures:
                # with every pixel ray hitting, the soft-silhouette gradient
                # is identically zero and the blob can never shrink
                # (observed: mask_loss pinned at 0.84 for 60 mi-steps).
                half = float(
                    jnp.min(self.object_aabb[1] - self.object_aabb[0])
                ) * 0.5
                radius = min(
                    0.45, max(0.05, 0.8 * half / (2.0 * self.config.scene_scale))
                )
                scene = SdfScene.create(
                    sdf_res=self.opt_config.init_res,
                    tex_res=self.opt_config.tex_res,
                    bsdf_type=self.opt_config.bsdf_type,
                    init_radius=radius,
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
            fn_of = self._maybe_distilled_fn_of(
                jax.random.fold_in(key, 7), guiding=scene.guiding
            )
            emitter_fn = fn_of(self.nerf_state.params)
            # per-image closure: appearance embedding + turntable rotation
            # (the reference's scatter_camera_idx broadcast + apply_sdf_scene)
            emitter_for_camera = lambda cam_idx, rot_id: fn_of(
                self.nerf_state.params, camera_index=cam_idx, rot_id=rot_id
            )
        # occlusion/background layers rendered ONCE at takeover (reference
        # render_internal_mask/render_occlusion, mitsuba_sdf.py:607-681)
        if self.config.use_occlusion:
            self._render_occlusion_layers()
        self._lr_up_scale = {}
        self.sdf_tx = build_sdf_optimizer(self.opt_config)
        from .sdf_optimizer import init_mean_params

        track_mean = self.config.load_mean_step != -1
        self.sdf_state = SdfOptState(
            step=jnp.int32(0), scene=scene, opt_state=self.sdf_tx.init(scene),
            mean_params=init_mean_params(scene) if track_mean else None,
        )
        if self.mesh is not None:
            from ..parallel.mesh import replicated

            self.sdf_state = jax.device_put(
                self.sdf_state, replicated(self.mesh)
            )
        self._serving_emitter_fn = emitter_fn
        self._serving_use_nerf = emitter_fn is not None
        self._serve_cache_key = None
        self._takeover_emitter_fn = emitter_fn
        self._takeover_emitter_for_camera = emitter_for_camera
        self._takeover_size = self.config.takeover_image_size
        self._takeover_spp = self.config.spp
        self._rebuild_sdf_step_fn()

    def _maybe_distilled_fn_of(self, key: jax.Array, guiding=None):
        """The emitter_fn_of the takeover should serve from: the full
        megakernel path, or (config.distill_emitter) a light-field student
        freshly distilled from the frozen NeRF (serving/distill.py). The
        fit is logged and kept on `self.distill_fidelity`. `guiding` (the
        scene's vMF mixture, when built) importance-mixes the fit's
        training directions toward the light lobes."""
        if not self.config.distill_emitter:
            return self._emitter_fn_of
        from ..serving.distill import (
            DistillConfig,
            distill_emitter,
            make_student_emitter_fn_of,
        )

        n_rot = (
            int(self.rotater.transforms.shape[0])
            if self.rotater is not None
            else 1
        )
        module, sparams, fidelity = distill_emitter(
            key,
            self.nerf_state.params,
            self._emitter_fn_of,
            scene_scale=self.config.scene_scale,
            object_aabb=self.object_aabb,
            num_cameras=int(self.model.num_cameras),
            rotater=self.rotater,
            n_rotations=n_rot,
            guiding=guiding,
            config=DistillConfig(steps=self.config.distill_steps),
        )
        self.distill_fidelity = fidelity
        print(
            "distilled emitter cache: "
            f"relRMS(linear)={fidelity['relrms_linear']:.4f} "
            f"RMSE(log)={fidelity['rmse_log']:.4f}"
        )
        return make_student_emitter_fn_of(
            module,
            sparams,
            scene_scale=self.config.scene_scale,
            object_aabb=self.object_aabb,
            rotater=self.rotater,
        )

    def _render_occlusion_layers(self):
        """Render the foreground-occluder / background layers from the
        current NeRF (reference render_internal_mask/render_occlusion,
        mitsuba_sdf.py:607-681) at the takeover render resolution."""
        from ..cameras.cameras import Cameras
        from ..data.occlusion import render_occlusion_layers

        cams = self.mi_dataset.cameras
        d = max(1, int(cams.height) // self.config.takeover_image_size)
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

    def begin_takeover_template(self, sdf_res: Optional[int] = None):
        """Build `sdf_state` as a pure RESTORE TEMPLATE: the correct pytree
        structure and shapes (sphere SDF at `sdf_res`, zeroed guiding) with
        none of begin_takeover's real work — no TSDF fusion, no emitter
        proposal, no occlusion renders. Everything here is overwritten by
        the checkpoint restore; call resume_takeover_bind() afterwards to
        bind the emitter/occlusion/step-fn to the restored params.

        `sdf_res` is the STORED grid resolution (the upsample schedule
        grows it mid-run), read from checkpoint metadata by the trainer."""
        use_env = self.config.guiding_type in ("env", "emitter_xml")
        scene = SdfScene.create(
            sdf_res=sdf_res or self.opt_config.init_res,
            tex_res=self.opt_config.tex_res,
            bsdf_type=self.opt_config.bsdf_type,
        )
        scene = scene.replace(hide_emitters=self.config.hide_emitters)
        if use_env:
            from ..guiding.path_guiding import EnvGuiding

            env = EnvGuiding(env_path=self.config.env_path).build_envmap(
                getattr(self, "data_dir", ".")
            )
            scene = scene.replace(envmap=env, guiding=None)
        else:
            from ..renderer.emitters import VMFMixture

            k = int(getattr(self.guiding, "n_clusters", 64))
            scene = scene.replace(
                guiding=VMFMixture(
                    positions=jnp.zeros((k, 3)),
                    weights=jnp.full((k,), 1.0 / k),
                    stds=jnp.full((k,), 0.5),
                )
            )
        self._lr_up_scale = {}
        self.sdf_tx = build_sdf_optimizer(self.opt_config)
        from .sdf_optimizer import init_mean_params

        track_mean = self.config.load_mean_step != -1
        self.sdf_state = SdfOptState(
            step=jnp.int32(0), scene=scene, opt_state=self.sdf_tx.init(scene),
            mean_params=init_mean_params(scene) if track_mean else None,
        )

    def resume_takeover_bind(self, key: jax.Array):
        """Re-bind everything begin_takeover derives from the NeRF params —
        emitter closures, occlusion layers — to the RESTORED params, replay
        the render-res upsample schedule up to the restored SDF resolution,
        and rebuild the jitted takeover step. Called by the trainer after a
        checkpoint restore lands in sdf_state/nerf_state."""
        assert self.sdf_state is not None
        use_env = self.config.guiding_type in ("env", "emitter_xml")
        emitter_fn = None
        emitter_for_camera = None
        if not use_env:
            # re-distill on resume: the cache is a cheap deterministic
            # function of the restored (frozen) NeRF params
            fn_of = self._maybe_distilled_fn_of(
                jax.random.fold_in(key, 7),
                guiding=self.sdf_state.scene.guiding,
            )
            emitter_fn = fn_of(self.nerf_state.params)
            emitter_for_camera = lambda cam_idx, rot_id: fn_of(
                self.nerf_state.params, camera_index=cam_idx, rot_id=rot_id
            )
        if self.config.use_occlusion:
            self._render_occlusion_layers()
        self._serving_emitter_fn = emitter_fn
        self._serving_use_nerf = emitter_fn is not None
        self._serve_cache_key = None
        self._takeover_emitter_fn = emitter_fn
        self._takeover_emitter_for_camera = emitter_for_camera
        # replay the render-res schedule: each applied volume upsample
        # (res -> 2*res-1, counted from the restored grid shape) doubled the
        # sensor res and halved spp past 512 (_maybe_upsample_render_res)
        size = self.config.takeover_image_size
        spp = self.config.spp
        res = int(self.sdf_state.scene.sdf.shape[0])
        r = int(self.opt_config.init_res)
        cap = int(min(self.mi_dataset.cameras.height,
                      self.mi_dataset.cameras.width))
        self._lr_up_scale = {}
        while r < res:
            r = r * 2 - 1
            size = min(size * 2, cap)
            if size >= 512 and spp > 1:
                spp = max(1, spp // 2)
            # replay the per-upsample lr decay alongside the render-res
            # schedule (one decay per applied volume upsample)
            for v in self.opt_config.variables:
                d = getattr(v, "lr_decay_at_up", 1.0)
                if d != 1.0:
                    self._lr_up_scale[v.name] = (
                        self._lr_up_scale.get(v.name, 1.0) * d
                    )
        if self._lr_up_scale:
            self.sdf_tx = build_sdf_optimizer(
                self.opt_config, self._lr_up_scale
            )
        self._takeover_size = size
        self._takeover_spp = spp
        self._rebuild_sdf_step_fn()

    def _apply_volume_upsample_lr_decay(self):
        """Apply VariableSpec.lr_decay_at_up after a VOLUME upsample:
        accumulate the per-variable scale, rebuild the optimizer + jitted
        step around the decayed transformation, and re-init the (freshly
        reset by post_step_host) moments under the new tx. x8 voxels
        support x-higher-frequency surface modes at the same step size —
        the round-4 prod run's gnorm_sdf exploded 131 -> 2108 within 50
        mi-steps of the 64->127 upsample without this."""
        decays = {
            v.name: v.lr_decay_at_up
            for v in self.opt_config.variables
            if getattr(v, "lr_decay_at_up", 1.0) != 1.0
        }
        if not decays:
            return
        for name, d in decays.items():
            self._lr_up_scale[name] = self._lr_up_scale.get(name, 1.0) * d
        self.sdf_tx = build_sdf_optimizer(self.opt_config, self._lr_up_scale)
        self.sdf_state = self.sdf_state.replace(
            opt_state=self.sdf_tx.init(self.sdf_state.scene)
        )
        print(f"volume upsample: lr scale -> {self._lr_up_scale}")
        self._rebuild_sdf_step_fn()

    def _rebuild_sdf_step_fn(self):
        """(Re)build the jitted takeover step at the current render
        resolution/spp (the render-res upsample schedule recompiles it —
        the reference's set_sensor_res + rescale_train,
        mitsuba_sdf.py:505-545)."""
        mean_start = self.config.mean_start
        if mean_start is None:
            mean_start = max(0, self.config.mi_opt_steps - 64)
        takeover = TakeoverConfig(
            spp=self._takeover_spp,
            spp_per_batch=min(
                TakeoverConfig.spp_per_batch, self._takeover_spp
            ),
            # cap at the live spp so the render-res schedule's spp halving
            # keeps the banded/bounded-dispatch path (exact when equal)
            # instead of falling back to one whole-image dispatch
            spp_attached=(
                min(self.config.spp_attached, self._takeover_spp)
                if self.config.spp_attached > 0 else 0
            ),
            image_height=self._takeover_size,
            image_width=self._takeover_size,
            scene_scale=self.config.scene_scale,
            mean_start_step=mean_start,
        )
        self.sdf_step_fn = make_sdf_train_step(
            self.opt_config, takeover, self.sdf_tx,
            emitter_fn=self._takeover_emitter_fn,
            render_config=self.render_config,
            emitter_for_camera=self._takeover_emitter_for_camera,
            rotater=self.rotater,
            camera_rot_ids=self.mi_dataset.rotation_ids,
            use_occlusion=self.occlusion is not None,
            mesh=self.mesh, data_axis=self.data_axis,
        )

    def _maybe_upsample_render_res(self, mi_step: int):
        """Double the takeover render resolution at the SDF upsample steps
        (reference render_upsample_iter drives sensor res with the volume
        res, halving spp once res >= 512, mitsuba_sdf.py:505-545)."""
        if mi_step not in self.opt_config.render_upsample_iter:
            return
        cap = int(min(self.mi_dataset.cameras.height,
                      self.mi_dataset.cameras.width))
        new_size = min(self._takeover_size * 2, cap)
        if new_size == self._takeover_size:
            return
        self._takeover_size = new_size
        if new_size >= 512 and self._takeover_spp > 1:
            self._takeover_spp = max(1, self._takeover_spp // 2)
        print(f"takeover render res -> {new_size}, spp {self._takeover_spp}")
        self._rebuild_sdf_step_fn()

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
        self._maybe_upsample_render_res(mi_step)
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
        pre_shape = self.sdf_state.scene.sdf.shape
        self.sdf_state = post_step_host(self.sdf_state, self.opt_config, self.sdf_tx)
        if self.sdf_state.scene.sdf.shape != pre_shape:
            self._apply_volume_upsample_lr_decay()
        # final-step swap to the parameter running means (reference
        # check_load_mean AFTER_TRAIN_ITERATION, mitsuba_sdf.py:766-776)
        lm = self.config.load_mean_step
        if lm is None:
            lm = self.config.mi_opt_steps - 1
        if lm >= 0 and mi_step == lm:
            from .sdf_optimizer import load_mean_parameters

            self.sdf_state = load_mean_parameters(self.sdf_state)
        return metrics

    # ------------------------------------------------------------- serving
    def set_relight_emitter(self, emitter_path) -> None:
        """Public relighting API (reference eval.py emitter_xml_path ->
        guiding_type='emitter_xml' swap, mitsuba_sdf.py:343-346): replace
        the serving emitter with an arbitrary envmap image. The SDF scene
        keeps its geometry/materials; radiance comes from the envmap."""
        assert self.sdf_state is not None, "relighting needs takeover state"
        from ..guiding.path_guiding import EmitterImageGuiding

        env = EmitterImageGuiding(emitter_path).build_envmap()
        scene = self.sdf_state.scene.replace(envmap=env, guiding=None)
        self.sdf_state = self.sdf_state.replace(scene=scene)
        self._serving_emitter_fn = None
        self._serving_use_nerf = False
        self._serve_cache_key = None

    def render_camera_outputs(
        self,
        dataset: ImageDataset,
        cam_index: int,
        key: jax.Array,
        spp: int = 64,
        spp_per_batch: int = 64,
        denoise: bool | str = False,
    ) -> dict:
        """Novel-view render (reference render_camera_outputs,
        mitsuba_sdf.py:1042-1080): SDF renderer with the NeRF emitter when
        the takeover has begun, plain NeRF render otherwise.

        spp is split into power-of-two host-side batches of at most
        spp_per_batch (the reference's render_aggregate + divide_spp,
        mi_util.py:22-104): one compile per distinct batch size, device
        memory bounded by spp_per_batch. denoise stands in for the
        reference's OptiX denoiser pass (mi_util.py:33-55): True or
        'bilateral' applies the joint bilateral filter; 'learned' applies
        the per-scene KPCN-lite kernel-prediction denoiser
        (renderer/learned_denoise.py), noise2noise-fitted from this
        scene's own renders on first use (fit_scene_denoiser)."""
        cams = dataset.cameras
        if self.sdf_state is None:
            out = self.render_fn(
                self.nerf_state.params, cams, jnp.int32(cam_index),
                cams.height, cams.width,
            )
            return out
        use_nerf_emitter = getattr(self, "_serving_use_nerf", None)
        if use_nerf_emitter is None:
            use_nerf_emitter = (
                getattr(self, "_serving_emitter_fn", None) is not None
                or self.config.guiding_type == "vmf"
            )
        h, w = cams.height, cams.width

        from ..renderer.spp_schedule import bilateral_denoise, divide_spp

        chunks = divide_spp(spp, max(1, spp_per_batch))

        cache_key = (
            h, w, tuple(sorted(set(chunks))), use_nerf_emitter,
            dataset.rotation_ids is not None,
        )
        if getattr(self, "_serve_cache_key", None) != cache_key:
            from functools import partial

            from ..renderer.integrator import render_spp
            from ..renderer.sensors import camera_rays_in_render_space

            # NeRF params enter as a jit ARGUMENT (a closure would embed
            # them as compile-time constants and go stale on updates)
            rotater = self.rotater
            rot_ids = dataset.rotation_ids

            @partial(jax.jit, static_argnums=(5,))
            def _serve(scene, cameras, cam_index, k, nerf_params, chunk_spp):
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
                if self.mesh is not None and self.data_axis is not None:
                    # multi-chip serving: pixel rays shard over the data
                    # axis exactly like the takeover train step (the
                    # reference's indices_by_rank eval sharding,
                    # render_utils.py:36-46)
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P

                    s = NamedSharding(self.mesh, P(self.data_axis, None))
                    o = jax.lax.with_sharding_constraint(o, s)
                    d = jax.lax.with_sharding_constraint(d, s)
                # serving is gradient-free: the warp reparameterization
                # changes nothing in the primal, so skip its 3x trace cost
                serve_cfg = dataclasses.replace(
                    self.render_config, reparam="soft"
                )
                return render_spp(
                    scene, o, d, k, chunk_spp,
                    emitter_fn=emitter, config=serve_cfg, remat=False,
                )

            self._serve_fn = _serve
            self._serve_cache_key = cache_key

        rgb_acc = None
        first = None
        for chunk_spp in chunks:
            key, k = jax.random.split(key)
            out = self._serve_fn(
                self.sdf_state.scene, cams, jnp.int32(cam_index), k,
                self.nerf_state.params, int(chunk_spp),
            )
            if first is None:
                first = out
            part = out["rgb"] * (chunk_spp / spp)
            rgb_acc = part if rgb_acc is None else rgb_acc + part
        rgb = rgb_acc.reshape(h, w, 3)
        depth = first["depth"].reshape(h, w, 1)
        normal = first["normal"].reshape(h, w, 3)
        if denoise == "learned":
            from ..renderer.learned_denoise import apply_denoiser

            if getattr(self, "_denoiser_params", None) is None:
                self.fit_scene_denoiser(jax.random.PRNGKey(17), dataset)
            rgb = apply_denoiser(
                self._denoiser_params, rgb, normal, depth,
                self._denoiser_config,
            )
        elif denoise:
            rgb = bilateral_denoise(rgb, normal=normal, depth=depth)
        return {
            "rgb": rgb,
            "depth": depth,
            "normal": normal,
            "accumulation": first["soft_mask"].reshape(h, w, 1),
        }

    def fit_scene_denoiser(
        self,
        key: jax.Array,
        dataset: ImageDataset,
        n_views: int = 3,
        fit_spp: int = 8,
        config=None,
    ) -> float:
        """Noise2noise fit of the per-scene learned denoiser
        (renderer/learned_denoise.py): render each of n_views training
        views TWICE with independent sample keys at fit_spp — the two
        half-buffers are each other's targets, so no clean reference is
        needed. Caches params on the pipeline; returns the final fit
        loss. Like the distilled emitter cache, training data comes from
        the renderer itself (serving/distill.py teacher batches)."""
        from ..renderer.learned_denoise import DenoiserConfig, fit_denoiser

        config = config or DenoiserConfig()
        n_cams = dataset.cameras.camera_to_worlds.shape[0]
        pairs = []
        for i in range(n_views):
            cam = int(i * max(1, n_cams // n_views)) % n_cams
            key, ka, kb = jax.random.split(key, 3)
            a = self.render_camera_outputs(
                dataset, cam, ka, spp=fit_spp, denoise=False
            )
            b = self.render_camera_outputs(
                dataset, cam, kb, spp=fit_spp, denoise=False
            )
            pairs.append((a["rgb"], b["rgb"], a["normal"], a["depth"]))
        key, kf = jax.random.split(key)
        params, loss = fit_denoiser(kf, pairs, config)
        self._denoiser_params = params
        self._denoiser_config = config
        return loss

    def get_average_eval_image_metrics(
        self, dataset: ImageDataset, key: jax.Array, spp: int = 64,
        get_std: bool = False,
    ) -> dict:
        """Averaged PSNR/SSIM/MAPE over an eval split (reference
        get_average_eval_image_metrics override, mitsuba_sdf.py:1235-1318)."""
        from ..engine.train_loop import eval_image_metrics

        from ..utils import capture_lock

        all_m: dict[str, list] = {}
        for i in range(dataset.images.shape[0]):
            capture_lock.checkpoint()  # yield to a driver capture window
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
