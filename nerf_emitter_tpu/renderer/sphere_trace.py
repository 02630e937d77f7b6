"""Sphere tracing with differentiable intersections.

Re-design of the diff-sdf integrators' ray-intersection core
(`sdf_direct_reparam_onesamplemis` sphere tracing, SURVEY.md §2.3): on TPU
the tracer is a fixed-iteration `lax.fori_loop` over ALL rays in lockstep
with per-ray done-masking (wavefront style) — no dynamic megakernel.

Differentiability: the primal march is non-differentiated
(stop_gradient); the returned hit distance t* is made differentiable via
one implicit-function-theorem correction

    t(theta) = t* - f(o + t* d; theta) / <grad_x f, d>

which has the exact first-order derivative of the true intersection w.r.t.
both the SDF parameters and the ray (o, d). This replaces Dr.Jit's
attached-recompute trick. Silhouette (visibility-discontinuity) gradients
are handled separately by the warp-field reparameterization in
`reparam.py` (Vicini et al. 2022 — the `get_warpfield` configs of the
reference).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .grid3d import sdf_eval, sdf_eval_nearest, sdf_gradient


def _coarse_march(sdf_c, o, d, t0, t_exit, config: "SphereTraceConfig"):
    """Conservative pre-march on the nearest-node SDF: one gather per step
    with a half-voxel-diagonal safety margin; stalls (not stops) within a
    voxel of the surface and hands off to the trilinear fine phase."""
    if config.coarse_steps <= 0:
        return t0
    r = sdf_c.shape[0]
    margin = 0.87 / (r - 1)  # ~ sqrt(3)/2 voxel

    def body(_, t):
        p = o + t[:, None] * d
        f = sdf_eval_nearest(sdf_c, p)
        step = jnp.maximum(config.step_scale * (f - margin), 0.0)
        t_new = jnp.minimum(t + step, t_exit)
        return t_new

    return jax.lax.fori_loop(0, config.coarse_steps, body, t0)


@dataclasses.dataclass(frozen=True)
class SphereTraceConfig:
    max_steps: int = 48  # trilinear (fine) steps
    hit_eps: float = 5e-4  # |f| below this counts as a hit
    t_max: float = 4.0  # beyond this the ray escaped
    step_scale: float = 0.9  # Lipschitz safety factor
    bbox_min: float = 0.0
    bbox_max: float = 1.0
    # coarse pre-march on the NEAREST-node SDF (1 gather/step instead of 8)
    # with a half-voxel-diagonal safety margin; 0 disables.
    coarse_steps: int = 24


def _ray_box_span(o: jax.Array, d: jax.Array, lo: float, hi: float):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return jnp.maximum(tmin, 0.0), tmax


def sphere_trace(
    sdf: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    config: SphereTraceConfig = SphereTraceConfig(),
    t_start: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """March rays to the zero level set. origins/directions: (N, 3) in the
    unit-cube grid frame; returns (t (N,), hit (N,) bool).

    Non-differentiable (the caller wraps with `differentiable_hit_t`).
    """
    o = jax.lax.stop_gradient(origins)
    d = jax.lax.stop_gradient(directions)
    sdf_c = jax.lax.stop_gradient(sdf)

    t_enter, t_exit = _ray_box_span(o, d, config.bbox_min, config.bbox_max)
    t_exit = jnp.minimum(t_exit, config.t_max)
    t0 = t_enter if t_start is None else jnp.maximum(t_enter, t_start)
    # rays that miss the box entirely
    inactive = t0 >= t_exit
    t0 = _coarse_march(sdf_c, o, d, t0, t_exit, config)

    def body(_, carry):
        t, done, f_min, t_min = carry
        p = o + t[:, None] * d
        f = sdf_eval(sdf_c, p)
        closer = f < f_min
        f_min = jnp.where(closer, f, f_min)
        t_min = jnp.where(closer, t, t_min)
        hit_now = jnp.abs(f) < config.hit_eps
        done_new = done | hit_now | (t > t_exit)
        step = config.step_scale * f
        t_new = jnp.where(done_new, t, t + step)
        return t_new, done_new, f_min, t_min

    t, done, f_min, t_min = jax.lax.fori_loop(
        0,
        config.max_steps,
        body,
        (t0, inactive, jnp.full_like(t0, 1e9), t0),
    )
    p = o + t[:, None] * d
    f = sdf_eval(sdf_c, p)
    hit = (jnp.abs(f) < config.hit_eps * 4.0) & (t <= t_exit) & ~inactive
    return t, hit


def sphere_trace_with_closest(
    sdf: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    config: SphereTraceConfig = SphereTraceConfig(),
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Like sphere_trace but also returns t_closest, the distance of the
    closest approach to the surface (argmin of f along the march) — used for
    differentiable soft visibility/silhouettes."""
    o = jax.lax.stop_gradient(origins)
    d = jax.lax.stop_gradient(directions)
    sdf_c = jax.lax.stop_gradient(sdf)

    t_enter, t_exit = _ray_box_span(o, d, config.bbox_min, config.bbox_max)
    t_exit = jnp.minimum(t_exit, config.t_max)
    inactive = t_enter >= t_exit
    t_start2 = _coarse_march(sdf_c, o, d, t_enter, t_exit, config)

    def body(_, carry):
        t, done, f_min, t_min = carry
        p = o + t[:, None] * d
        f = sdf_eval(sdf_c, p)
        closer = f < f_min
        f_min = jnp.where(closer, f, f_min)
        t_min = jnp.where(closer, t, t_min)
        hit_now = jnp.abs(f) < config.hit_eps
        done_new = done | hit_now | (t > t_exit)
        t_new = jnp.where(done_new, t, t + config.step_scale * f)
        return t_new, done_new, f_min, t_min

    t, done, f_min, t_min = jax.lax.fori_loop(
        0,
        config.max_steps,
        body,
        (t_start2, inactive, jnp.full_like(t_enter, 1e9), t_start2),
    )
    p = o + t[:, None] * d
    f = sdf_eval(sdf_c, p)
    hit = (jnp.abs(f) < config.hit_eps * 4.0) & (t <= t_exit) & ~inactive
    return t, hit, t_min


def soft_visibility(
    sdf: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    t_closest: jax.Array,
    hit: jax.Array,
    beta: float = 0.01,
) -> jax.Array:
    """Differentiable silhouette indicator in [0, 1].

    Hit rays -> 1. Miss rays -> sigmoid(-f(x_closest)/beta), where f is
    evaluated differentiably at the DETACHED closest-approach point
    (envelope theorem: dt_closest terms vanish at the argmin). Raising the
    surface (f down) raises the indicator — the boundary gradient the hard
    `hit` mask lacks. Stand-in for the warp-field reparameterization's
    boundary term (Vicini et al. 2022) on the silhouette integral.
    """
    x = origins + jax.lax.stop_gradient(t_closest)[:, None] * directions
    f_close = sdf_eval(sdf, x)
    soft = jax.nn.sigmoid(-f_close / beta)
    return jnp.where(hit, 1.0, soft)


def differentiable_hit_t(
    sdf: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    t_star: jax.Array,
    eps: float = 1e-6,
) -> jax.Array:
    """Attach exact first-order derivatives to a detached hit distance.

    With x* = o + t* d on the surface, the implicit function theorem on
    f(o + t d; theta) = 0 gives  dt = -(df)/(<grad f, d>); realized by the
    Newton-step expression below whose value equals t* but whose JVP/VJP are
    the implicit derivatives (w.r.t. sdf values AND o, d).
    """
    t_det = jax.lax.stop_gradient(t_star)
    x = origins + t_det[:, None] * directions
    f = sdf_eval(sdf, x)
    g = sdf_gradient(jax.lax.stop_gradient(sdf), jax.lax.stop_gradient(x))
    denom = jnp.sum(g * jax.lax.stop_gradient(directions), axis=-1)
    denom = jnp.where(jnp.abs(denom) < eps, jnp.sign(denom) * eps + eps, denom)
    return t_det - (f - jax.lax.stop_gradient(f)) / jax.lax.stop_gradient(denom)


def trace_hit_point(
    sdf: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    config: SphereTraceConfig = SphereTraceConfig(),
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Differentiable surface intersection: (x (N,3), t (N,), hit (N,))."""
    t_star, hit = sphere_trace(sdf, origins, directions, config)
    t = differentiable_hit_t(sdf, origins, directions, t_star)
    x = origins + t[:, None] * directions
    return x, t, hit
