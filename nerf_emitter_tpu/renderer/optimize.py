"""SDF/texture optimization machinery: variables, regularizers,
redistancing, upsample schedules, named opt-configs.

Re-design of the diff-sdf submodule's opt stack (SURVEY.md §2.3):
- `variables.py` SdfVariable/VolumeVariable -> parameter clamps + per-
  variable regularizers + upsample schedule, expressed as pure functions
  over the SdfScene pytree (validate_params / validate_gradients /
  update_scene of the reference's opt_configs).
- `regularizations.py eval_discrete_laplacian_reg` -> `laplacian_reg`.
- `redistancing.redistance` (fastsweep eikonal solver) -> Godunov upwind
  Jacobi iteration under lax.fori_loop — the parallel-in-space form of fast
  sweeping, which is the TPU-friendly fixpoint (fastsweep's C++ sweeps are
  inherently sequential per direction).
- `opt_configs.py get_opt_config` -> OPT_CONFIGS registry with the
  reference's recipe names ('diffuse-12-relativel1-hqq', ...).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .scene import DIFFUSE, PRINCIPLED, SdfScene


# ---------------------------------------------------------------------------
# regularizers
# ---------------------------------------------------------------------------


def laplacian_reg(grid: jax.Array) -> jax.Array:
    """Mean squared discrete Laplacian of a (R,R,R,C) grid (the reference's
    eval_discrete_laplacian_reg, sparse variant dropped: XLA fuses the
    shifted adds)."""
    g = grid
    lap = -6.0 * g[1:-1, 1:-1, 1:-1]
    lap = lap + g[:-2, 1:-1, 1:-1] + g[2:, 1:-1, 1:-1]
    lap = lap + g[1:-1, :-2, 1:-1] + g[1:-1, 2:, 1:-1]
    lap = lap + g[1:-1, 1:-1, :-2] + g[1:-1, 1:-1, 2:]
    return jnp.mean(lap**2)


def smooth_gradient(
    g: jax.Array, lam: float, n_iters: int = 16
) -> jax.Array:
    """Sobolev / screened-Poisson gradient preconditioning for voxel grids:
    approximately solves (I + lam*L) x = g, L the 6-neighbor graph
    Laplacian, by Jacobi iteration.

    This is the role cholespy plays in the reference's 'hqq' opt configs
    (SURVEY.md §2.4: sparse Cholesky of the same screened Laplacian): the
    descent direction is smoothed so each step moves the surface coherently
    instead of roughening it voxel-by-voxel (Nicolet et al. 2021, "Large
    Steps in Inverse Rendering"). A direct sparse factorization is hostile
    to TPU (sequential triangular solves); the Jacobi fixpoint is a
    6-point stencil — pure fused elementwise XLA — and (I + lam*L) is
    strictly diagonally dominant, so ~16 iterations reach sub-percent
    residuals for the lam used here.
    """
    if lam <= 0.0:
        return g
    squeeze = g.ndim == 4
    x = g[..., 0] if squeeze and g.shape[-1] == 1 else g

    def neighbor_sum(u):
        # edge-replicate padding = homogeneous Neumann boundary: a border
        # node's missing neighbor contributes its own value, which cancels
        # against the matching diagonal term
        ue = jnp.pad(u, [(1, 1)] * 3 + [(0, 0)] * (u.ndim - 3), mode="edge")
        s = (
            ue[:-2, 1:-1, 1:-1] + ue[2:, 1:-1, 1:-1]
            + ue[1:-1, :-2, 1:-1] + ue[1:-1, 2:, 1:-1]
            + ue[1:-1, 1:-1, :-2] + ue[1:-1, 1:-1, 2:]
        )
        return s

    rhs = x

    def body(_, u):
        return (rhs + lam * neighbor_sum(u)) / (1.0 + 6.0 * lam)

    out = jax.lax.fori_loop(0, n_iters, body, rhs / (1.0 + 6.0 * lam))
    return out[..., None] if (squeeze and g.shape[-1] == 1) else out


def sobolev_preconditioner(
    lam: float, n_iters: int = 16
) -> "optax.GradientTransformation":
    """optax transformation applying smooth_gradient to every leaf; chain
    it before Adam for the 'sdf' label (build_sdf_optimizer)."""
    import optax

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return (
            jax.tree.map(lambda u: smooth_gradient(u, lam, n_iters), updates),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def uniform_adam(
    lr: float, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> "optax.GradientTransformation":
    """Adam with a UNIFORM (scalar, infinity-norm) second moment per
    variable — Nicolet et al. 2021 ("Large Steps in Inverse Rendering")
    UniformAdam. Per-coordinate Adam divides each voxel's update by its own
    RMS, re-amplifying exactly the high-frequency components the Sobolev
    preconditioner suppressed (root cause of the round-3 surface-roughening
    divergence: curvature 19->452 over the takeover while smooth_lam=2.0
    was chained BEFORE per-coordinate Adam). A scalar nu preserves the
    spatial smoothness of the preconditioned descent direction while
    keeping step-size adaptivity."""
    import optax

    def init_fn(params):
        return {
            "mu": jax.tree.map(jnp.zeros_like, params),
            "nu": jax.tree.map(
                lambda p: jnp.zeros((), jnp.float32), params
            ),
            "count": jnp.zeros((), jnp.int32),
        }

    def update_fn(updates, state, params=None):
        del params
        count = state["count"] + 1
        mu = jax.tree.map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state["mu"], updates
        )
        # infinity-norm tracker with EMA decay (Adamax-style): scale-free
        # across resolutions, no per-coordinate shaping
        nu = jax.tree.map(
            lambda v, g: jnp.maximum(
                b2 * v, jnp.max(jnp.abs(g)).astype(jnp.float32) ** 2
            ),
            state["nu"],
            updates,
        )
        bc = 1.0 - b1 ** count.astype(jnp.float32)
        upd = jax.tree.map(
            lambda m, v: (-lr / bc) * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return upd, {"mu": mu, "nu": nu, "count": count}

    return optax.GradientTransformation(init_fn, update_fn)


def eikonal_residual(sdf: jax.Array) -> jax.Array:
    """Mean |(|grad f| - 1)| over interior nodes (finite differences)."""
    g = sdf[..., 0] if sdf.ndim == 4 else sdf
    r = g.shape[0]
    h = 1.0 / (r - 1)
    dx = (g[2:, 1:-1, 1:-1] - g[:-2, 1:-1, 1:-1]) / (2 * h)
    dy = (g[1:-1, 2:, 1:-1] - g[1:-1, :-2, 1:-1]) / (2 * h)
    dz = (g[1:-1, 1:-1, 2:] - g[1:-1, 1:-1, :-2]) / (2 * h)
    return jnp.mean(jnp.abs(jnp.sqrt(dx**2 + dy**2 + dz**2 + 1e-12) - 1.0))


# ---------------------------------------------------------------------------
# redistancing (eikonal fixpoint)
# ---------------------------------------------------------------------------


def redistance(sdf: jax.Array, n_iters: int = 100) -> jax.Array:
    """Rebuild a signed distance function from the zero level set.

    Godunov upwind discretization of |grad f| = 1 solved by damped Jacobi
    iteration with the interface pinned: nodes adjacent to a sign change
    keep their (first-order) distance estimate; all others relax toward the
    eikonal solution. Replaces the reference's fastsweep call
    (mitsuba_sdf.py:595, redistancing.redistance).
    """
    squeeze = sdf.ndim == 4
    f = sdf[..., 0] if squeeze else sdf
    r = f.shape[0]
    h = 1.0 / (r - 1)

    sign = jnp.sign(f)
    # frozen interface band: any node with a neighbor of opposite sign
    def shift(a, ax, d):
        return jnp.roll(a, d, axis=ax)

    band = jnp.zeros_like(f, bool)
    for ax in range(3):
        for d in (-1, 1):
            band = band | (sign * shift(sign, ax, d) <= 0)
    # first-order distance estimate at band nodes: |f| / |grad f| (central
    # differences) — exact when f is an affine-scaled SDF.
    fe = jnp.pad(f, 1, mode="edge")
    gx = (fe[2:, 1:-1, 1:-1] - fe[:-2, 1:-1, 1:-1]) / (2 * h)
    gy = (fe[1:-1, 2:, 1:-1] - fe[1:-1, :-2, 1:-1]) / (2 * h)
    gz = (fe[1:-1, 1:-1, 2:] - fe[1:-1, 1:-1, :-2]) / (2 * h)
    gnorm = jnp.sqrt(gx**2 + gy**2 + gz**2 + 1e-12)
    phi = jnp.abs(f) / jnp.maximum(gnorm, 1e-3)

    def body(_, u):
        # Godunov: a = min over each axis of upwind neighbor
        pads = []
        big = 1e9
        up = jnp.pad(u, 1, constant_values=big)
        a = jnp.minimum(up[:-2, 1:-1, 1:-1], up[2:, 1:-1, 1:-1])
        b = jnp.minimum(up[1:-1, :-2, 1:-1], up[1:-1, 2:, 1:-1])
        c = jnp.minimum(up[1:-1, 1:-1, :-2], up[1:-1, 1:-1, 2:])
        del pads
        # sort (a, b, c) ascending
        lo = jnp.minimum(jnp.minimum(a, b), c)
        hi = jnp.maximum(jnp.maximum(a, b), c)
        mid = a + b + c - lo - hi
        # candidate 1: lo + h
        u1 = lo + h
        # candidate 2: solve (u-lo)^2 + (u-mid)^2 = h^2
        s2 = lo + mid
        disc2 = 2.0 * h * h - (lo - mid) ** 2
        u2 = 0.5 * (s2 + jnp.sqrt(jnp.maximum(disc2, 0.0)))
        # candidate 3: all three
        s3 = lo + mid + hi
        disc3 = s3**2 - 3.0 * (lo**2 + mid**2 + hi**2 - h * h)
        u3 = (s3 + jnp.sqrt(jnp.maximum(disc3, 0.0))) / 3.0
        unew = jnp.where(u1 <= mid, u1, jnp.where(u2 <= hi, u2, u3))
        # plain Jacobi (no min-lock): transient underestimates may appear
        # while the wavefront passes, but the iteration converges to the
        # discrete viscosity solution from any initialization.
        return jnp.where(band, phi, unew)

    init = jnp.where(band, phi, 1e9 * jnp.ones_like(phi))
    u = jax.lax.fori_loop(0, n_iters, body, init)
    # cap at the unit-cube diagonal: if the zero set is empty (degenerate
    # TSDF fusion) or a region is unreached, values stay finite
    u = jnp.minimum(u, jnp.sqrt(3.0))
    out = sign * u
    # preserve exact zeros' sign
    out = jnp.where(sign == 0, 0.0, out)
    return out[..., None] if squeeze else out


# ---------------------------------------------------------------------------
# variables & opt configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VariableSpec:
    """One optimizable scene leaf (SdfVariable / VolumeVariable)."""

    name: str  # 'sdf' | 'albedo' | 'roughness'
    lr: float
    clamp: Optional[tuple[float, float]] = None
    regularizer_weight: float = 0.0
    redistance_freq: int = 0  # steps; 0 = never
    upsample_iters: tuple[int, ...] = ()
    upsample_factor: int = 2
    # Sobolev gradient smoothing strength (the 'hqq' recipes' cholespy
    # screened-Laplacian preconditioner); 0 = off
    smooth_lam: float = 0.0
    # 'adam' (per-coordinate) | 'uniform_adam' (scalar second moment,
    # Nicolet et al. 2021 — REQUIRED for smooth_lam > 0: per-coordinate
    # normalization undoes the smoothing and roughens the surface)
    optimizer: str = "adam"
    # lr multiplier applied at each VOLUME upsample (1.0 = off). The
    # round-4 prod run diverged right after the 64->127 upsample
    # (gnorm_sdf 131 -> 2108 over 50 mi-steps) even with scheduled
    # redistancing: x8 voxels support x-higher-frequency modes at the
    # same step size. The bisect's lr_decay_at_up=0.25 arm converged
    # standalone; combo_lr (uniform_adam + redist5 + decay) scored best.
    lr_decay_at_up: float = 1.0


@dataclasses.dataclass(frozen=True)
class SdfOptConfig:
    """A named optimization recipe (reference opt_configs.get_opt_config).

    Names keep the reference scheme: '<bsdf>-<res pow>-<loss>-<quality>'.
    """

    name: str
    bsdf_type: int
    loss: str  # key into ops.losses.RGB_LOSSES
    mask_loss_mult: float = 10.0
    variables: Sequence[VariableSpec] = ()
    batch_size: int = 4  # images per mi step
    init_res: int = 64
    tex_res: int = 32
    render_upsample_iter: tuple[int, ...] = (64, 128, 192)
    curvature_mult: float = 0.005
    curvature_spp: int = 2
    # FD epsilon ~1.5 voxels at init_res: sub-voxel epsilons measure
    # trilinear interpolation kinks, not surface curvature, and the
    # resulting gradients wreck the surface (observed: curvature 20->84
    # while view loss rose)
    curvature_epsilon: float = 0.025
    n_steps: int = 320


def _default_variables(lr: float, upsample: tuple[int, ...]) -> tuple[VariableSpec, ...]:
    return (
        VariableSpec(
            "sdf",
            lr=lr,
            clamp=(-1.0, 1.0),
            regularizer_weight=1e-5,
            # Redistance every 5 steps, NOT every step: the round-4 bisect
            # (outputs/r4/bisect*.json, scripts/round4/bisect_takeover.py)
            # showed per-step redistancing was the round-3 divergence
            # driver — its first-order band re-estimate (|f|/|grad f| from
            # noisy central differences) jitters the zero set every step
            # and the accumulated drift roughens the surface (curvature
            # 19->452 in prod). freq=5 and freq=10 both converge (view
            # 0.17 vs diverged 0.53 on the bisect task) with identical
            # geometry error; 5 keeps the eikonal property tighter.
            redistance_freq=5,
            upsample_iters=upsample,
            smooth_lam=2.0,  # 'hqq' = high-quality: preconditioned sdf grads
            # scalar second moment: per-coordinate Adam re-amplifies the
            # high frequencies the Sobolev smoothing removes (bisect
            # 'uadam' arm; required at 127^3 where redistance scheduling
            # alone no longer holds the surface)
            optimizer="uniform_adam",
            lr_decay_at_up=0.25,
        ),
        VariableSpec("albedo", lr=lr * 1.5, clamp=(0.0, 1.0)),
        VariableSpec("roughness", lr=lr, clamp=(0.02, 1.0)),
    )


OPT_CONFIGS: dict[str, SdfOptConfig] = {}


def _register(cfg: SdfOptConfig):
    OPT_CONFIGS[cfg.name] = cfg
    return cfg


_register(
    SdfOptConfig(
        name="diffuse-12-relativel1-hqq",
        bsdf_type=DIFFUSE,
        loss="relative_l1",
        variables=_default_variables(3e-3, (64, 128)),
        init_res=64,
    )
)
_register(
    SdfOptConfig(
        name="diffuse-12-relativel1-hqq-r128",
        bsdf_type=DIFFUSE,
        loss="relative_l1",
        # one SDF upsample (64 -> 127): the reference's second doubling
        # (opt_configs render_upsample_iter) targets 256^2+ sensors; at a
        # 128^2 capture a 127^3 grid already out-resolves the pixels, and
        # the 253^3 tail would triple per-step redistance cost for free.
        variables=_default_variables(3e-3, (64,)),
        init_res=64,
    )
)
_register(
    SdfOptConfig(
        name="principled-12-relativel1-hqq",
        bsdf_type=PRINCIPLED,
        loss="relative_l1",
        variables=_default_variables(3e-3, (64, 128)),
        init_res=64,
    )
)
_register(
    SdfOptConfig(
        name="principled-12-relativemaxl1-hqq-unirough",
        bsdf_type=PRINCIPLED,
        loss="relative_max_l1",
        variables=_default_variables(3e-3, (64, 128)),
        init_res=64,
        tex_res=32,
    )
)


def get_opt_config(name: str) -> SdfOptConfig:
    if name not in OPT_CONFIGS:
        raise KeyError(f"unknown opt config {name!r}; have {sorted(OPT_CONFIGS)}")
    return OPT_CONFIGS[name]


def validate_params(scene: SdfScene, config: SdfOptConfig, step: int) -> SdfScene:
    """Post-step parameter validation: clamps + scheduled redistancing +
    upsampling (reference validate_params/update_scene)."""
    updates = {}
    for var in config.variables:
        val = getattr(scene, var.name)
        if var.clamp is not None and var.name != "sdf":
            val = jnp.clip(val, var.clamp[0], var.clamp[1])
        if var.name == "sdf" and var.redistance_freq > 0 and step % var.redistance_freq == 0:
            val = redistance(val)
        updates[var.name] = val
    return scene.replace(**updates)


def maybe_upsample(scene: SdfScene, config: SdfOptConfig, step: int) -> SdfScene:
    """Volume upsample schedule. Driven by the SDF VariableSpec's own
    upsample_iters (the reference separates per-variable upsampling from
    render_upsample_iter, which doubles the SENSOR resolution): with the
    default 64-init and two iters the grid ends at 253^3 ~ the reference's
    256-class final resolution, while the render res follows all three
    render_upsample_iter doublings. (Coupling the grid to the render
    schedule drove it to 505^3 — 8x the memory of the final render-matched
    grid for no documented quality target.)"""
    from .grid3d import upsample_grid

    spec = next((v for v in config.variables if v.name == "sdf"), None)
    iters = spec.upsample_iters if spec is not None else config.render_upsample_iter
    if step in iters:
        cur = scene.sdf.shape[0]
        scene = scene.replace(sdf=upsample_grid(scene.sdf, cur * 2 - 1))
    return scene


def validate_gradients(grads: SdfScene) -> SdfScene:
    """NaN/Inf sweep on gradients with reset-to-zero (the reference's
    emitter-grad NaN sweep, mitsuba_sdf.py:1194-1214, and Dr.Jit
    validate_gradients)."""
    return jax.tree.map(
        lambda g: jnp.where(jnp.isfinite(g), g, 0.0) if g is not None else None,
        grads,
    )
