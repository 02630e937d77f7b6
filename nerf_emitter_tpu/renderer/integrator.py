"""Direct-illumination integrator with one-sample MIS.

Re-design of the diff-sdf integrators (SURVEY.md §2.3):
- `sdf_direct_reparam_onesamplemis`: direct lighting on a sphere-traced SDF
  with one-sample multiple importance sampling between BSDF sampling and
  emitter (guiding/envmap) sampling. Escaped rays evaluate the environment
  emitter — which may be an arbitrary callable `emitter_fn(x, d) -> rgb`
  (the NeRF bridge).
- `reparam_split_light`'s megakernel split (surface pass, then a batched
  light pass so emitter queries happen OUTSIDE the wavefront) is the natural
  shape here: we trace all surface interactions first, build one flat batch
  of emitter-query rays, evaluate the emitter ONCE on it, then composite.
  That flat batch is exactly what shard_map distributes over chips.
- `sdf_curvature` and `sdf_normal_depth` render modes are provided as
  aux outputs.

All randomness via explicit keys; fixed shapes; jit/grad-safe.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .bsdf import (
    cosine_sample_hemisphere,
    diffuse_eval,
    diffuse_pdf,
    principled_eval,
    principled_pdf,
    principled_sample,
)
from ..utils.math import normalize as _normalize
from .grid3d import grid_sample, sdf_normal
from .scene import DIFFUSE, SdfScene
from .reparam import WarpConfig, reparam_direction
from .sphere_trace import (
    SphereTraceConfig,
    differentiable_hit_t,
    soft_visibility,
    sphere_trace,
    sphere_trace_with_closest,
    trace_hit_point,
)

EmitterFn = Callable[[jax.Array, jax.Array], jax.Array]  # (x, d) -> rgb


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    trace: SphereTraceConfig = SphereTraceConfig()
    shadow_eps: float = 2e-3  # offset along normal for secondary rays
    use_visibility: bool = True  # trace shadow rays (integrator attr)
    guiding_mis_compensation: bool = True
    soft_beta: float = 0.01  # softness of the differentiable silhouette
    # 'both' = deterministic MIS — both strategies evaluated per ray (lower
    # variance, 2x secondary rays; the default and the low-spp choice);
    # 'one_sample' = stochastically pick BSDF or emitter strategy per ray
    # (the reference's onesamplemis): ONE shadow trace + ONE emitter query
    # per ray — the perf lever when the emitter is the NeRF and spp is
    # moderate+ (its estimator is unbiased but heavier-tailed, so at very
    # low spp 'both' converges better).
    mis_mode: str = "both"
    # Silhouette-gradient treatment (the reference's warp-field configs,
    # diff-sdf configs.py 'warponemis'):
    # 'warp' = warp-field reparameterization of primary (and optionally
    #   secondary) ray directions — unbiased boundary gradients on the RGB
    #   image itself (primal renders are bit-identical);
    # 'soft' = no reparameterization; boundary signal only flows through
    #   the soft_mask output (cheaper; needs a mask loss to see shape).
    reparam: str = "warp"
    warp: WarpConfig = WarpConfig()
    # also reparameterize emitter/BSDF sample rays (shadow-edge gradients)
    warp_secondary: bool = True


def _bsdf_eval(scene: SdfScene, x, n, wi, wo):
    albedo = grid_sample(scene.albedo, x)
    if scene.bsdf_type == DIFFUSE:
        return diffuse_eval(albedo, n, wo)
    rough = grid_sample(scene.roughness, x)
    return principled_eval(albedo, rough, n, wi, wo)


def _bsdf_pdf(scene: SdfScene, x, n, wi, wo):
    if scene.bsdf_type == DIFFUSE:
        return diffuse_pdf(n, wo)
    rough = grid_sample(scene.roughness, x)
    return principled_pdf(rough, n, wi, wo)


def _bsdf_sample(key, scene: SdfScene, x, n, wi):
    if scene.bsdf_type == DIFFUSE:
        return cosine_sample_hemisphere(key, n)
    rough = grid_sample(scene.roughness, x)
    return principled_sample(key, rough, n, wi)


def _emitter_sample(key, scene: SdfScene, x):
    """Sample an emitter-strategy direction at shading points x."""
    if scene.guiding is not None:
        return scene.guiding.sample(key, x)
    if scene.envmap is not None:
        d, pdf = scene.envmap.sample(key, x.shape[:-1])
        return d, pdf
    # fallback: uniform sphere
    d = jax.random.normal(key, x.shape)
    d = _normalize(d)
    return d, jnp.full(x.shape[:-1], 1.0 / (4.0 * jnp.pi))


def _emitter_pdf(scene: SdfScene, x, d):
    if scene.guiding is not None:
        return scene.guiding.pdf(x, d)
    if scene.envmap is not None:
        return scene.envmap.pdf(d)
    return jnp.full(x.shape[:-1], 1.0 / (4.0 * jnp.pi))


def render_direct(
    scene: SdfScene,
    origins: jax.Array,
    directions: jax.Array,
    key: jax.Array,
    *,
    emitter_fn: Optional[EmitterFn] = None,
    config: RenderConfig = RenderConfig(),
) -> dict[str, jax.Array]:
    """One-spp direct-illumination estimate for (N, 3) rays in render space.

    emitter_fn overrides the envmap for radiance lookups (the NeRF bridge);
    sampling/pdf still come from scene.guiding/envmap (importance proposal).
    Returns dict with 'rgb' (N,3), 'hit' (N,), 'depth' (N,), 'normal' (N,3).
    """
    n_rays = origins.shape[0]
    k_strat, k_bsdf, k_emit = jax.random.split(key, 3)
    one_sample = config.mis_mode == "one_sample"
    use_warp = config.reparam == "warp"

    def radiance(x, d):
        if emitter_fn is not None:
            return emitter_fn(x, d)
        if scene.envmap is not None:
            return scene.envmap.eval(d)
        return jnp.zeros((*d.shape[:-1], 3))

    # ---- warp-field reparameterization of the primary directions: primal
    # values unchanged, derivatives pick up the silhouette boundary terms
    # (reference 'warponemis'; see reparam.py)
    if use_warp:
        dirs, jac = reparam_direction(
            scene.sdf, origins, directions, config.trace, config.warp
        )
    else:
        dirs, jac = directions, None

    def warp_secondary(x_from, d):
        """Reparameterize a secondary (shadow/emitter) direction; pdfs are
        still evaluated at the primal d (the sampled variable)."""
        if use_warp and config.warp_secondary:
            return reparam_direction(
                scene.sdf, x_from, d, config.trace, config.warp
            )
        return d, None

    # ---- primary intersection (differentiable) + soft silhouette
    t_star, hit, t_closest = sphere_trace_with_closest(
        scene.sdf, origins, dirs, config.trace
    )
    t = differentiable_hit_t(scene.sdf, origins, dirs, t_star)
    x = origins + t[:, None] * dirs
    # soft_mask stays on the UNWARPED directions: its smoothed-boundary
    # gradient is already well-defined, and mixing in the warp's (noisier)
    # divergence term measurably degrades mask-supervised convergence
    # (A/B at spp 4: mask loss plateaus 4x higher with warped dirs here).
    soft_mask = soft_visibility(
        scene.sdf, origins, directions, t_closest, hit, beta=config.soft_beta
    )
    n = sdf_normal(scene.sdf, x)
    # flip normal toward the viewer
    n = jnp.where(jnp.sum(n * dirs, axis=-1, keepdims=True) > 0, -n, n)
    wi = -dirs

    x_off = x + config.shadow_eps * n

    if one_sample:
        # One-sample MIS (the reference's `sdf_direct_reparam_onesamplemis`):
        # pick BSDF or emitter strategy uniformly per ray; with the balance
        # heuristic the estimator collapses to 2·f·L·V/(pdf_e+pdf_b) at the
        # single selected direction — ONE shadow trace and ONE emitter
        # (NeRF) query per ray instead of two.
        d_e, _ = _emitter_sample(k_emit, scene, x_off)
        d_b, _ = _bsdf_sample(k_bsdf, scene, x, n, wi)
        sel = jax.random.bernoulli(k_strat, 0.5, (n_rays,))
        d = jnp.where(sel[:, None], d_e, d_b)
        pdf_e_d = _emitter_pdf(scene, x_off, d)
        pdf_b_d = _bsdf_pdf(scene, x, n, wi, d)
        d_w, jac_s = warp_secondary(x_off, d)
        f = _bsdf_eval(scene, x, n, wi, d_w)
        if config.use_visibility:
            _, occluded = sphere_trace(scene.sdf, x_off, d_w, config.trace)
        else:
            occluded = jnp.zeros(n_rays, bool)
        le = radiance(x_off, d_w)
        w = 2.0 / jnp.maximum(pdf_e_d + pdf_b_d, 1e-9)
        surface_rgb = jnp.where(occluded[:, None], 0.0, f * le * w[:, None])
        if jac_s is not None:
            surface_rgb = surface_rgb * jac_s[:, None]
    else:
        # ---- strategy A: emitter sampling
        d_e, pdf_e = _emitter_sample(k_emit, scene, x_off)
        pdf_e_b = _bsdf_pdf(scene, x, n, wi, d_e)
        d_e_w, jac_e = warp_secondary(x_off, d_e)
        f_e = _bsdf_eval(scene, x, n, wi, d_e_w)
        if config.use_visibility:
            _, occluded_e = sphere_trace(scene.sdf, x_off, d_e_w, config.trace)
        else:
            occluded_e = jnp.zeros(n_rays, bool)
        le = radiance(x_off, d_e_w)
        w_mis_e = pdf_e / jnp.maximum(pdf_e + pdf_e_b, 1e-9)
        contrib_e = jnp.where(
            occluded_e[:, None],
            0.0,
            f_e * le * (w_mis_e / jnp.maximum(pdf_e, 1e-9))[:, None],
        )
        if jac_e is not None:
            contrib_e = contrib_e * jac_e[:, None]

        # ---- strategy B: BSDF sampling
        d_b, pdf_b = _bsdf_sample(k_bsdf, scene, x, n, wi)
        pdf_b_e = _emitter_pdf(scene, x_off, d_b)
        d_b_w, jac_b = warp_secondary(x_off, d_b)
        f_b = _bsdf_eval(scene, x, n, wi, d_b_w)
        if config.use_visibility:
            _, occluded_b = sphere_trace(scene.sdf, x_off, d_b_w, config.trace)
        else:
            occluded_b = jnp.zeros(n_rays, bool)
        lb = radiance(x_off, d_b_w)
        w_mis_b = pdf_b / jnp.maximum(pdf_b + pdf_b_e, 1e-9)
        contrib_b = jnp.where(
            occluded_b[:, None],
            0.0,
            f_b * lb * (w_mis_b / jnp.maximum(pdf_b, 1e-9))[:, None],
        )
        if jac_b is not None:
            contrib_b = contrib_b * jac_b[:, None]

        surface_rgb = contrib_e + contrib_b

    # ---- escaped primary rays see the emitter directly
    if scene.hide_emitters:
        miss_rgb = jnp.zeros((n_rays, 3))
    else:
        miss_rgb = radiance(origins, dirs)

    rgb = jnp.where(hit[:, None], surface_rgb, miss_rgb)
    hit_f = hit.astype(rgb.dtype)
    if jac is not None:
        # area factor of the primary warp (primal 1): carries the
        # silhouette boundary gradient of BOTH the image and the alpha
        rgb = rgb * jac[:, None]
        alpha = hit_f * jac
    else:
        alpha = soft_mask

    return {
        "rgb": rgb,
        "hit": hit,
        "alpha": alpha,
        "soft_mask": soft_mask,
        "depth": jnp.where(hit, t, 0.0),
        "normal": jnp.where(hit[:, None], n, 0.0),
    }


def render_spp(
    scene: SdfScene,
    origins: jax.Array,
    directions: jax.Array,
    key: jax.Array,
    spp: int,
    *,
    emitter_fn: Optional[EmitterFn] = None,
    config: RenderConfig = RenderConfig(),
    remat: bool = True,
    spp_per_batch: int = 0,
) -> dict[str, jax.Array]:
    """Average `spp` independent one-sample estimates via lax.map with
    rematerialization — replacing the reference's render_aggregate
    detach-plus-one-attached-batch trick (mi_util.py:22-56): under
    jax.checkpoint each spp batch's intermediates are recomputed in the
    backward instead of stored, so memory is flat in spp while gradients
    remain exact for ALL samples (the reference only attaches one batch).

    spp_per_batch > 1 vmaps that many samples inside each lax.map slice
    (the reference's spp_per_batch, mitsuba_sdf.py:96-97): emitter/NeRF
    queries then see rays*spp_per_batch-sized batches — the MXU lever when
    the per-sample ray count is small — at spp_per_batch times the live
    memory per slice."""

    b = max(1, spp_per_batch)
    if spp % b != 0:
        b = 1
    n_chunks = spp // b

    def one(ks):
        out = jax.vmap(
            lambda k: render_direct(
                scene, origins, directions, k,
                emitter_fn=emitter_fn, config=config,
            )
        )(ks)
        # reduce inside the slice so the lax.map carry stays (N,*)-sized
        return {
            "rgb": jnp.mean(out["rgb"], axis=0),
            "hit": out["hit"][0],
            "alpha": jnp.mean(out["alpha"], axis=0),
            "soft_mask": out["soft_mask"][0],
            "depth": out["depth"][0],
            "normal": out["normal"][0],
        }

    if remat:
        one = jax.checkpoint(one)
    keys = jax.random.split(key, spp).reshape(n_chunks, b, -1)
    outs = jax.lax.map(one, keys)
    rgb = jnp.mean(outs["rgb"], axis=0)
    return {
        "rgb": rgb,
        "hit": outs["hit"][0],
        # alpha is stochastic only through the warp jacobian: average it
        "alpha": jnp.mean(outs["alpha"], axis=0),
        "soft_mask": outs["soft_mask"][0],
        "depth": outs["depth"][0],
        "normal": outs["normal"][0],
    }


def render_curvature(
    scene: SdfScene,
    origins: jax.Array,
    directions: jax.Array,
    config: RenderConfig = RenderConfig(),
    curvature_epsilon: float = 5e-3,
) -> jax.Array:
    """Mean-curvature magnitude image (the reference's `sdf_curvature`
    integrator used for the curvature regularizer, mitsuba_sdf.py:973-991):
    finite-difference Laplacian of the SDF at hit points."""
    x, t, hit = trace_hit_point(scene.sdf, origins, directions, config.trace)
    e = curvature_epsilon
    from .grid3d import sdf_eval

    lap = -6.0 * sdf_eval(scene.sdf, x)
    for axis in range(3):
        off = jnp.zeros(3).at[axis].set(e)
        lap = lap + sdf_eval(scene.sdf, x + off) + sdf_eval(scene.sdf, x - off)
    lap = lap / (e * e)
    return jnp.where(hit, jnp.abs(lap), 0.0)


def render_normal_depth(
    scene: SdfScene,
    origins: jax.Array,
    directions: jax.Array,
    config: RenderConfig = RenderConfig(),
) -> dict[str, jax.Array]:
    """The reference's `sdf_normal_depth` integrator (stroke/depth tools)."""
    x, t, hit = trace_hit_point(scene.sdf, origins, directions, config.trace)
    n = sdf_normal(scene.sdf, x)
    return {
        "normal": jnp.where(hit[:, None], n, 0.0),
        "depth": jnp.where(hit, t, 0.0),
        "hit": hit,
    }
