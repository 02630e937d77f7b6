"""SDF inverse-rendering optimization loop (the takeover phase).

Re-design of the Mitsuba/Dr.Jit side of MitsubaSdfPipeline
(nerfstudio/pipelines/mitsuba_sdf.py:914-1040 get_train_loss_dict +
:827-835 mi_opt_step) and the diff-sdf opt machinery: per takeover step,

  for each of batch_size train images:
    render the SDF scene at the image's camera (spp batched under
    jax.checkpoint) -> view loss + mask loss + curvature loss
  + Laplacian regularizer
  -> one optax step on (sdf, albedo, roughness) with NaN-swept grads,
  -> clamps / scheduled redistancing / upsample schedule.

The Dr.Jit Adam + torch optimizer pair and the rank-0/worker lock-step
protocol (:1014-1024) collapse into one jitted update; multi-chip scaling
shards the pixel/spp axis via sharding constraints instead of
pad_scatter/pad_gather.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import flax.struct as struct
import jax
import jax.numpy as jnp
import optax

from ..cameras.cameras import Cameras
from ..ops import losses as L
from ..renderer.integrator import (
    EmitterFn,
    RenderConfig,
    render_curvature,
    render_spp,
)
from ..renderer.optimize import (
    SdfOptConfig,
    laplacian_reg,
    maybe_upsample,
    validate_gradients,
    validate_params,
)
from ..renderer.scene import SdfScene
from ..renderer.sensors import camera_rays_in_render_space


class SdfOptState(struct.PyTreeNode):
    step: jax.Array
    scene: SdfScene
    opt_state: Any
    # Running (Polyak) means of the optimized volumes, swapped in at
    # load_mean_step (reference load_mean_parameters,
    # mitsuba_sdf.py:547-550,766-776; load_mean_step=2319 in
    # method_configs.py:329). None = mean tracking off.
    mean_params: Any = None
    mean_count: jax.Array = struct.field(default_factory=lambda: jnp.int32(0))


OPTIMIZED_VARS = ("sdf", "albedo", "roughness")


def init_mean_params(scene: SdfScene) -> dict:
    """Start the running mean at the current optimized volumes. Copies:
    aliasing the live scene buffers would double-donate under the jitted
    step's donate_argnums."""
    return {
        name: jnp.array(getattr(scene, name), copy=True)
        for name in OPTIMIZED_VARS
    }


def load_mean_parameters(state: SdfOptState) -> SdfOptState:
    """Swap the running means into the scene (the reference's
    load_mean_parameters at load_mean_step). No-op when tracking is off."""
    if state.mean_params is None:
        return state
    return state.replace(scene=state.scene.replace(**state.mean_params))


def build_sdf_optimizer(
    config: SdfOptConfig, lr_scale=None
) -> optax.GradientTransformation:
    """Per-variable Adam (the reference's masked/sparse Dr.Jit Adam over
    traversed params). `lr_scale` maps variable name -> accumulated
    VOLUME-upsample lr decay (VariableSpec.lr_decay_at_up applied once per
    upsample; the pipeline replays it on resume)."""
    lr_scale = lr_scale or {}
    lrs = {v.name: v.lr * lr_scale.get(v.name, 1.0) for v in config.variables}

    def label_fn(scene: SdfScene):
        return SdfScene(
            sdf="sdf",
            albedo="albedo",
            roughness="roughness",
            envmap=None if scene.envmap is None else jax.tree.map(lambda _: "frozen", scene.envmap),
            guiding=None if scene.guiding is None else jax.tree.map(lambda _: "frozen", scene.guiding),
            bsdf_type=scene.bsdf_type,
            hide_emitters=scene.hide_emitters,
        )

    from ..renderer.optimize import sobolev_preconditioner, uniform_adam

    specs = {v.name: v for v in config.variables}
    txs = {}
    for name in ("sdf", "albedo", "roughness"):
        spec = specs.get(name)
        lam = spec.smooth_lam if spec is not None else 0.0
        kind = spec.optimizer if spec is not None else "adam"
        if kind == "uniform_adam":
            # scalar second moment (Nicolet et al. 2021): preserves the
            # Sobolev-smoothed descent direction — per-coordinate Adam
            # re-amplifies the high frequencies the smoothing removed
            # (round-3 divergence root cause)
            adam = uniform_adam(lrs.get(name, 1e-3))
        else:
            adam = optax.adam(lrs.get(name, 1e-3), eps=1e-15)
        # 'hqq' recipes: screened-Laplacian smoothing of the raw gradient
        # BEFORE the moment-based step (the reference's cholespy
        # preconditioner applied to the Dr.Jit grads ahead of its Adam)
        txs[name] = (
            optax.chain(sobolev_preconditioner(lam), adam) if lam > 0 else adam
        )
    txs["frozen"] = optax.set_to_zero()
    return optax.multi_transform(txs, label_fn)


@dataclasses.dataclass(frozen=True)
class TakeoverConfig:
    spp: int = 32
    spp_per_batch: int = 8
    image_height: int = 64
    image_width: int = 64
    scene_scale: float = 1.0
    laplacian_mult: float = 1e-2
    mask_loss_mult: float = 10.0
    use_mask_loss: bool = True
    # > 0 enables the AGGREGATE estimator (the reference's render_aggregate,
    # mi_util.py:22-56): the primal image is the mean over all spp, rendered
    # in detached spp_per_batch-sized dispatches, while the gradient flows
    # through ONE attached spp_attached-sample render. This bounds the
    # device time of every dispatch (remote-link requirement) at the cost
    # of the reference's (not render_spp's exact) gradient estimator; each
    # image also becomes its own gradient-accumulation micro-step.
    # spp_attached == spp keeps the banded/bounded dispatch structure with
    # EXACT gradients (no detached chunks).
    spp_attached: int = 0
    # Polyak-mean accumulation starts at this mi-step (reference
    # load_mean_parameters semantics, mitsuba_sdf.py:547-550): averaging
    # from takeover/upsample onward dilutes the evaluated parameters with
    # the early, unconverged trajectory — the mean should cover only the
    # settled tail.
    mean_start_step: int = 0


def make_sdf_train_step(
    opt_config: SdfOptConfig,
    takeover: TakeoverConfig,
    tx: optax.GradientTransformation,
    emitter_fn: Optional[EmitterFn] = None,
    render_config: RenderConfig = RenderConfig(),
    mesh=None,
    data_axis: Optional[str] = None,
    emitter_for_camera: Optional[Callable] = None,
    rotater=None,
    camera_rot_ids: Optional[jax.Array] = None,
    use_occlusion: bool = False,
):
    """Returns jitted step(state, cameras, cam_indices, gt_images, gt_masks,
    key[, occ_layers]) -> (state, metrics). gt_images: (B, H, W, 3);
    cam_indices: (B,).

    emitter_for_camera(cam_idx, rot_id) -> EmitterFn builds a per-image
    emitter closure (appearance embedding + turntable rotation — the
    reference's scatter_camera_idx broadcast); takes precedence over the
    static emitter_fn.

    rotater + camera_rot_ids rotate each image's sensor into the canonical
    object frame (reference rotater.apply_mi_sensor).

    use_occlusion=True: the step takes occ_layers = (occlusion_rgb (B,h,w,3),
    occlusion_mask (B,h,w,1), background_rgb (B,h,w,3)) and composites the
    render over the background and under the foreground occluders before the
    view loss (reference mitsuba_sdf.py:951-956); the mask loss is weighted
    by (1 - occlusion_mask) — the reference's internal masks (:607-643).

    With a mesh + data_axis, the flat pixel-ray batch of every render is
    sharded over the axis (scene/params replicated) — the reference's
    pad_scatter/pad_gather ray sharding (SURVEY.md §2.2) as one sharding
    constraint; XLA all-reduces the scene grads over ICI."""
    loss_fn_rgb = L.RGB_LOSSES[opt_config.loss]
    h, w = takeover.image_height, takeover.image_width

    def shard_rays(o, d):
        if mesh is None or data_axis is None:
            return o, d
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = NamedSharding(mesh, P(data_axis, None))
        return (
            jax.lax.with_sharding_constraint(o, s),
            jax.lax.with_sharding_constraint(d, s),
        )

    def scaled_cameras(cameras: Cameras) -> Cameras:
        """Rescale intrinsics to the takeover render resolution."""
        if cameras.height == h and cameras.width == w:
            return cameras
        sy = h / cameras.height
        sx = w / cameras.width
        return Cameras(
            camera_to_worlds=cameras.camera_to_worlds,
            fx=cameras.fx * sx, fy=cameras.fy * sy,
            cx=cameras.cx * sx, cy=cameras.cy * sy,
            width=w, height=h, camera_type=cameras.camera_type,
        )

    def rot_id_of(cam_idx):
        if rotater is None or camera_rot_ids is None:
            return None
        return camera_rot_ids[cam_idx]

    def render_one(scene, cameras, cam_idx, key):
        # independent streams for pixel jitter and the spp estimator
        # (reusing one key correlates the two estimators)
        k_jitter, k_spp = jax.random.split(key)
        rid = rot_id_of(cam_idx)
        o, d = camera_rays_in_render_space(
            scaled_cameras(cameras), cam_idx, h, w, takeover.scene_scale,
            key=k_jitter, rotater=rotater, rot_id=rid,
        )
        o, d = shard_rays(o, d)
        em = (
            emitter_for_camera(cam_idx, rid)
            if emitter_for_camera is not None
            else emitter_fn
        )
        out = render_spp(
            scene, o, d, k_spp, takeover.spp,
            emitter_fn=em, config=render_config,
            spp_per_batch=takeover.spp_per_batch,
        )
        return out

    def loss_of(scene, cameras, cam_indices, gt_images, gt_masks, key, occ_layers):
        b = gt_images.shape[0]
        keys = jax.random.split(key, b)

        def per_image(args):
            cam_idx, gt, mask, k, occ = args
            k_render, k_curv = jax.random.split(k)
            # multi-res schedule: GT resampled to the render resolution
            # (the reference's rescale_train, mitsuba_datamanager.py:137-140)
            if gt.shape[:2] != (h, w):
                gt = jax.image.resize(gt, (h, w, 3), "linear")
                mask = jax.image.resize(mask, (h, w, 1), "linear")
            out = render_one(scene, cameras, cam_idx, k_render)
            pred = out["rgb"].reshape(h, w, 3)
            soft = out["soft_mask"].reshape(h, w, 1)
            mask_weight = jnp.ones_like(mask)
            if occ is not None:
                # composite: occluders over (render over background)
                # (reference mitsuba_sdf.py:951-956, render_utils.py:232-245)
                o_rgb, o_m, bg = occ
                rs = lambda x, c: jax.image.resize(x, (h, w, c), "linear")
                o_rgb, o_m, bg = rs(o_rgb, 3), rs(o_m, 1), rs(bg, 3)
                base = pred * soft + bg * (1.0 - soft)
                pred = o_rgb * o_m + base * (1.0 - o_m)
                # internal mask: silhouette supervision only where the
                # object is not hidden by foreground occluders (:607-643)
                mask_weight = 1.0 - o_m
            view_loss = loss_fn_rgb(pred, gt)
            # differentiable silhouette loss (soft visibility carries the
            # boundary gradient the hard hit mask lacks)
            mask_loss = jnp.mean(mask_weight * (soft - mask) ** 2)
            # curvature regularizer (2 spp render of |Laplacian| at hits)
            o, d = camera_rays_in_render_space(
                scaled_cameras(cameras), cam_idx, h, w, takeover.scene_scale,
                key=k_curv, rotater=rotater, rot_id=rot_id_of(cam_idx),
            )
            curv = jnp.mean(
                render_curvature(
                    scene, o, d, render_config,
                    curvature_epsilon=opt_config.curvature_epsilon,
                )
            )
            return view_loss, mask_loss, curv

        if occ_layers is None:
            map_fn = lambda args: per_image((*args, None))
            xs = (cam_indices, gt_images, gt_masks, keys)
        else:
            map_fn = per_image
            xs = (cam_indices, gt_images, gt_masks, keys, occ_layers)
        view_l, mask_l, curv_l = jax.lax.map(map_fn, xs)
        view_loss = jnp.mean(view_l)
        mask_loss = jnp.mean(mask_l) if takeover.use_mask_loss else 0.0
        curv_loss = jnp.mean(curv_l)
        lap = laplacian_reg(scene.sdf)
        total = (
            view_loss
            + takeover.mask_loss_mult * mask_loss
            + opt_config.curvature_mult * curv_loss
            + takeover.laplacian_mult * lap
        )
        return total, {
            "loss": total,
            "view_loss": view_loss,
            "mask_loss": mask_loss,
            "curvature": curv_loss,
            "laplacian": lap,
        }

    def _apply(state, grads, metrics):
        grads = validate_gradients(grads)
        # per-variable gradient norms: the divergence diagnostic (a data
        # term whose norm collapses against the regularizers' is invisible
        # in the loss values alone)
        metrics = dict(metrics)
        for name in OPTIMIZED_VARS:
            metrics[f"gnorm_{name}"] = jnp.linalg.norm(getattr(grads, name))
        updates, opt_state = tx.update(grads, state.opt_state, state.scene)
        scene = optax.apply_updates(state.scene, updates)
        if state.mean_params is not None:
            # uniform running mean over steps >= mean_start_step:
            # m_k = m_{k-1} + (theta_k - m_{k-1})/(k+1)
            active = state.step >= takeover.mean_start_step
            c = state.mean_count + active.astype(jnp.int32)
            inv = 1.0 / jnp.maximum(c, 1)
            means = {
                name: jnp.where(
                    active,
                    m + (getattr(scene, name) - m) * inv.astype(m.dtype),
                    m,
                )
                for name, m in state.mean_params.items()
            }
        else:
            means, c = None, state.mean_count
        return (
            SdfOptState(
                step=state.step + 1, scene=scene, opt_state=opt_state,
                mean_params=means, mean_count=c,
            ),
            metrics,
        )

    @partial(jax.jit, donate_argnums=(0,))
    def step(
        state: SdfOptState,
        cameras: Cameras,
        cam_indices,
        gt_images,
        gt_masks,
        key,
        occ_layers=None,
    ):
        grads, metrics = jax.grad(loss_of, has_aux=True)(
            state.scene, cameras, cam_indices, gt_images, gt_masks, key,
            occ_layers,
        )
        return _apply(state, grads, metrics)

    # ------------------------------------------------------------------
    # aggregate mode (spp_attached > 0, spp > spp_attached): the
    # reference's render_aggregate estimator (mi_util.py:22-56) split into
    # BOUNDED dispatches — detached spp_per_batch-sample primal renders, a
    # single attached spp_attached-sample gradient render per image, and
    # per-image gradient accumulation. Required over a remote device link,
    # where one multi-minute whole-batch dispatch gets killed.
    # ------------------------------------------------------------------
    spp_att = takeover.spp_attached
    # spp_att == spp selects the BANDED-EXACT mode: no detached chunks, the
    # full spp is attached per pixel band (remat keeps memory flat), and the
    # detach trick degenerates to the identity — exact gradients with the
    # bounded-dispatch structure the tunnel/capture protocol needs.
    aggregate = spp_att > 0 and takeover.spp >= spp_att

    def _tag(result, is_aggregate: bool):
        # estimator provenance: aggregate-mode 'loss' is the one-attached-
        # chunk estimator, not the exact-mode scalar — label which one
        # produced the logged value so cross-run curves are comparable
        state, metrics = result
        metrics = dict(metrics)
        metrics["estimator_aggregate"] = 1.0 if is_aggregate else 0.0
        return state, metrics

    if not aggregate:
        if not use_occlusion:
            return lambda state, cameras, cam_indices, gt, masks, key: _tag(
                step(state, cameras, cam_indices, gt, masks, key), False
            )
        return lambda *a, **kw: _tag(step(*a, **kw), False)

    n_det = takeover.spp - spp_att
    from ..renderer.spp_schedule import divide_spp

    det_chunks = divide_spp(n_det, max(1, takeover.spp_per_batch))

    def _rays_of(cameras, cam_idx, k_jitter):
        rid = rot_id_of(cam_idx)
        o, d = camera_rays_in_render_space(
            scaled_cameras(cameras), cam_idx, h, w, takeover.scene_scale,
            key=k_jitter, rotater=rotater, rot_id=rid,
        )
        return shard_rays(o, d)

    def _em_of(cam_idx):
        if emitter_for_camera is not None:
            return emitter_for_camera(cam_idx, rot_id_of(cam_idx))
        return emitter_fn

    @partial(jax.jit, static_argnums=(4,))
    def primal_chunk(scene, cameras, cam_idx, key_img, chunk_spp, chunk_i):
        """Detached chunk_spp-sample rgb SUM for one image (no grad)."""
        k_jitter, k_spp = jax.random.split(key_img)
        o, d = _rays_of(cameras, cam_idx, k_jitter)
        k = jax.random.fold_in(jax.random.fold_in(k_spp, 0), chunk_i)
        out = render_spp(
            scene, o, d, k, chunk_spp,
            emitter_fn=_em_of(cam_idx), config=render_config, remat=False,
        )
        return out["rgb"] * chunk_spp  # sum over samples

    # The attached-chunk gradient program's live memory scales with
    # (pixels x spp_attached); past the render-res upsamples one whole-
    # image program exceeds HBM (measured: 33.7G wanted at 256^2 x spp 16
    # vs 15.75G on a v5e). Band the gradient over pixel ROWS: every loss
    # term decomposes exactly over disjoint pixel sets (the rgb losses are
    # per-pixel-normalized means; grid-global terms are weighted band_h/h
    # so they sum back to themselves), one compiled program serves every
    # band via a dynamic row offset, and each band is one more bounded
    # dispatch for the tunnel/capture protocol.
    import os as _os

    _band_budget = int(
        _os.environ.get("NERF_EMITTER_GRAD_BAND_BUDGET", 128 * 128 * 16)
    )  # pixels x spp_att that fit in HBM (v5e-measured default)
    n_grad_bands = 1
    while (h * w * spp_att) // n_grad_bands > _band_budget and n_grad_bands < h:
        n_grad_bands *= 2
    band_h = max(1, h // n_grad_bands)

    def grad_loss_one(scene, cameras, cam_idx, key_img, det_sum, gt, mask,
                      occ, row0, band_i):
        k_jitter, k_spp = jax.random.split(key_img)
        # fold the band index in: bands must not replay the same per-ray
        # randomness shifted by band_h rows
        k_att = jax.random.fold_in(jax.random.fold_in(k_spp, 1), band_i)
        k_curv = jax.random.fold_in(jax.random.fold_in(k_spp, 2), band_i)
        if gt.shape[:2] != (h, w):
            gt = jax.image.resize(gt, (h, w, 3), "linear")
            mask = jax.image.resize(mask, (h, w, 1), "linear")

        def band_flat(x):  # (h*w, c) -> rows [row0, row0+band_h)
            return jax.lax.dynamic_slice(
                x, (row0 * w, 0), (band_h * w, x.shape[1])
            )

        def band_img(x):  # (h, w, c) -> (band_h, w, c)
            return jax.lax.dynamic_slice(
                x, (row0, 0, 0), (band_h, w, x.shape[2])
            )

        o, d = _rays_of(cameras, cam_idx, k_jitter)
        o, d = shard_rays(band_flat(o), band_flat(d))
        gt_b, mask_b = band_img(gt), band_img(mask)
        out = render_spp(
            scene, o, d, k_att, spp_att,
            emitter_fn=_em_of(cam_idx), config=render_config,
            spp_per_batch=takeover.spp_per_batch,
        )
        # primal = full-spp mean; gradient flows through the attached
        # samples only, at SCALE 1 — the reference's detach trick
        # `img - detach(img) + img_sum/n` (mi_util.py:48) keeps the
        # attached-mean gradient unscaled. Dividing the attached term by
        # spp instead (round 3) silently down-weighted the data gradient
        # by spp_att/spp against the unscaled regularizer gradients.
        mean = (band_flat(det_sum) + out["rgb"] * spp_att) / takeover.spp
        pred = out["rgb"] + jax.lax.stop_gradient(mean - out["rgb"])
        pred = pred.reshape(band_h, w, 3)
        soft = out["soft_mask"].reshape(band_h, w, 1)
        mask_weight = jnp.ones_like(mask_b)
        if occ is not None:
            o_rgb, o_m, bg = occ
            rs = lambda x, c: jax.image.resize(x, (h, w, c), "linear")
            o_rgb, o_m, bg = (
                band_img(rs(o_rgb, 3)), band_img(rs(o_m, 1)),
                band_img(rs(bg, 3)),
            )
            base = pred * soft + bg * (1.0 - soft)
            pred = o_rgb * o_m + base * (1.0 - o_m)
            mask_weight = 1.0 - o_m
        frac = band_h / h  # band terms sum to the full-image terms
        view_loss = loss_fn_rgb(pred, gt_b) * frac
        mask_loss = jnp.mean(mask_weight * (soft - mask_b) ** 2) * frac
        oc, dc = _rays_of(cameras, cam_idx, k_curv)
        oc, dc = shard_rays(band_flat(oc), band_flat(dc))
        curv = frac * jnp.mean(
            render_curvature(
                scene, oc, dc, render_config,
                curvature_epsilon=opt_config.curvature_epsilon,
            )
        )
        lap = frac * laplacian_reg(scene.sdf)
        total = (
            view_loss
            + (takeover.mask_loss_mult * mask_loss
               if takeover.use_mask_loss else 0.0)
            + opt_config.curvature_mult * curv
            + takeover.laplacian_mult * lap
        )
        return total, {
            "loss": total, "view_loss": view_loss, "mask_loss": mask_loss,
            "curvature": curv, "laplacian": lap,
        }

    @jax.jit
    def grad_one_band(scene, cameras, cam_idx, key_img, det_sum, gt, mask,
                      occ, row0, band_i):
        return jax.grad(grad_loss_one, has_aux=True)(
            scene, cameras, cam_idx, key_img, det_sum, gt, mask, occ,
            row0, band_i,
        )

    @partial(jax.jit, donate_argnums=(0,))
    def apply_step(state, grads, metrics):
        return _apply(state, grads, metrics)

    from ..utils import capture_lock

    def step_aggregate(state, cameras, cam_indices, gt_images, gt_masks,
                       key, occ_layers=None):
        b = gt_images.shape[0]
        keys = jax.random.split(key, b)
        grads_acc = None
        metrics_acc = None
        for i in range(b):
            # aggregate mode is a host-side sequence of bounded dispatches:
            # the natural point to yield to a driver capture window
            capture_lock.checkpoint()
            det_sum = jnp.zeros((h * w, 3), jnp.float32)
            for ci, chunk in enumerate(det_chunks):
                capture_lock.checkpoint()
                det_sum = det_sum + primal_chunk(
                    state.scene, cameras, cam_indices[i], keys[i],
                    int(chunk), jnp.int32(ci),
                )
            occ_i = (
                None if occ_layers is None
                else tuple(x[i] for x in occ_layers)
            )
            g, m = None, None
            for bi in range(n_grad_bands):
                capture_lock.checkpoint()
                gb, mb = grad_one_band(
                    state.scene, cameras, cam_indices[i], keys[i], det_sum,
                    gt_images[i], gt_masks[i], occ_i,
                    jnp.int32(bi * band_h), jnp.int32(bi),
                )
                g = gb if g is None else jax.tree.map(jnp.add, g, gb)
                m = mb if m is None else jax.tree.map(jnp.add, m, mb)
            grads_acc = (
                g if grads_acc is None
                else jax.tree.map(jnp.add, grads_acc, g)
            )
            metrics_acc = (
                m if metrics_acc is None
                else jax.tree.map(jnp.add, metrics_acc, m)
            )
        inv_b = 1.0 / b
        grads = jax.tree.map(lambda x: x * inv_b, grads_acc)
        metrics = jax.tree.map(lambda x: x * inv_b, metrics_acc)
        return _tag(apply_step(state, grads, metrics), spp_att < takeover.spp)

    if not use_occlusion:
        return lambda state, cameras, cam_indices, gt, masks, key: (
            step_aggregate(state, cameras, cam_indices, gt, masks, key)
        )
    return step_aggregate


def post_step_host(state: SdfOptState, opt_config: SdfOptConfig, tx) -> SdfOptState:
    """Host-side schedule: clamps + redistancing (jitted internally) and the
    upsample schedule, which changes array SHAPES and therefore lives
    outside the jitted step (reference validate_params/update_scene at
    mi_opt_step, mitsuba_sdf.py:827-835)."""
    step = int(state.step)
    scene = validate_params(state.scene, opt_config, step)
    new_scene = maybe_upsample(scene, opt_config, step)
    if new_scene.sdf.shape != scene.sdf.shape:
        # re-init optimizer state for the new shape; the running mean
        # restarts at the upsampled volumes (its old resolution is stale)
        return SdfOptState(
            step=state.step, scene=new_scene, opt_state=tx.init(new_scene),
            mean_params=(
                init_mean_params(new_scene)
                if state.mean_params is not None else None
            ),
            mean_count=jnp.int32(0),
        )
    return state.replace(scene=scene)
