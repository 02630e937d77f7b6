"""Losses: HDR photometric losses + nerfacto regularizers.

Re-design of nerfstudio/model_components/losses.py. HDR losses
(losses.py:580-614): RawNeRF gradient-of-log-tonemap weighted L2, relative
L1/L2 and relative-max L1 for inverse rendering. Regularizers
(losses.py:112-232): proposal interlevel loss, distortion loss, orientation
and predicted-normal losses.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# photometric losses (HDR)
# ---------------------------------------------------------------------------


def rawnerf_loss(pred: jax.Array, gt: jax.Array, eps: float = 1e-3) -> jax.Array:
    """RawNeRF loss: L2 weighted by the gradient of log tonemapping,
    (pred - gt)^2 / (sg(pred) + eps)^2."""
    scale = jax.lax.stop_gradient(pred) + eps
    return jnp.mean(((pred - gt) / scale) ** 2)


def relative_l1_loss(pred: jax.Array, gt: jax.Array, eps: float = 1e-2) -> jax.Array:
    return jnp.mean(jnp.abs(pred - gt) / (jax.lax.stop_gradient(jnp.abs(pred)) + eps))


def relative_l2_loss(pred: jax.Array, gt: jax.Array, eps: float = 1e-2) -> jax.Array:
    return jnp.mean((pred - gt) ** 2 / (jax.lax.stop_gradient(pred**2) + eps))


def relative_max_l1_loss(pred: jax.Array, gt: jax.Array, eps: float = 1e-2) -> jax.Array:
    """Relative L1 normalized by the per-pixel max over channels (the
    reference's RelativeMaxL1Loss used in principled opt configs)."""
    denom = jax.lax.stop_gradient(
        jnp.max(jnp.abs(pred), axis=-1, keepdims=True)
    ) + eps
    return jnp.mean(jnp.abs(pred - gt) / denom)


def l1_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean((pred - gt) ** 2)


RGB_LOSSES = {
    "l1": l1_loss,
    "l2": l2_loss,
    "mse": l2_loss,
    "rawnerf": rawnerf_loss,
    "relative_l1": relative_l1_loss,
    "relative_l2": relative_l2_loss,
    "relative_max_l1": relative_max_l1_loss,
}


# ---------------------------------------------------------------------------
# proposal/interlevel + distortion losses (nerfacto regularizers)
# ---------------------------------------------------------------------------


def _outer(t0_starts, t0_ends, t1_starts, t1_ends, y1):
    """For each target bin [t0_s, t0_e], sum of y1 mass of source bins
    overlapping it (mip-NeRF 360 inner/outer measure; upper bound).
    All shapes (..., S)."""
    cy1 = jnp.concatenate([jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)

    # gather-free bracketing via masked monotone reductions (see
    # samplers.sample_pdf for the TPU rationale): cy1 is nondecreasing, so
    # cy1[idx] values are max-reductions over prefix masks.
    # cy1_lo = cy1[searchsorted_right(t1_starts, t0_s) - 1]
    mask_lo = t1_starts[..., None, :] <= t0_starts[..., :, None]  # (.., S0, S1)
    cy1_lo = jnp.max(
        jnp.where(mask_lo, cy1[..., None, : t1_starts.shape[-1]], 0.0), axis=-1
    )
    # cy1_hi = cy1[count(t1_ends <= t0_e)]
    mask_hi = t1_ends[..., None, :] <= t0_ends[..., :, None]
    cy1_hi = jnp.max(jnp.where(mask_hi, cy1[..., None, 1:], 0.0), axis=-1)
    return cy1_hi - cy1_lo


def lossfun_outer(t, w, t_env, w_env, eps: float = 1e-7):
    """Interlevel loss core: penalize proposal (env) histograms that put less
    mass than the fine histogram in overlapping bins.
    t: (..., S+1) fine bin edges; w: (..., S) fine weights;
    t_env/w_env: proposal edges/weights."""
    w_outer = _outer(t[..., :-1], t[..., 1:], t_env[..., :-1], t_env[..., 1:], w_env)
    return jnp.clip(w - w_outer, 0.0, None) ** 2 / (w + eps)


def interlevel_loss(weights_list: Sequence[jax.Array], spacing_bins_list: Sequence[jax.Array]) -> jax.Array:
    """weights_list[i]: (n_rays, S_i); spacing_bins_list[i]: (n_rays, S_i+1)
    normalized spacing edges. The LAST entry is the fine (nerf) level."""
    c = jax.lax.stop_gradient(spacing_bins_list[-1])
    w = jax.lax.stop_gradient(weights_list[-1])
    total = 0.0
    for cp, wp in zip(spacing_bins_list[:-1], weights_list[:-1]):
        total = total + jnp.mean(jnp.sum(lossfun_outer(c, w, cp, wp), axis=-1))
    return total


def distortion_loss(weights: jax.Array, spacing_starts: jax.Array, spacing_ends: jax.Array) -> jax.Array:
    """Mip-NeRF 360 distortion loss over normalized spacing.
    weights: (n_rays, S); spacing_*: (n_rays, S)."""
    w = weights
    m = (spacing_starts + spacing_ends) / 2.0
    interval = spacing_ends - spacing_starts

    # pairwise term sum_ij w_i w_j |m_i - m_j| computed via sorted cumsum trick
    # m is already sorted along the sample axis.
    wm = w * m
    cw = jnp.cumsum(w, axis=-1)
    cwm = jnp.cumsum(wm, axis=-1)
    # shift to exclusive
    cw_ex = jnp.concatenate([jnp.zeros_like(cw[..., :1]), cw[..., :-1]], axis=-1)
    cwm_ex = jnp.concatenate([jnp.zeros_like(cwm[..., :1]), cwm[..., :-1]], axis=-1)
    pairwise = 2.0 * jnp.sum(wm * cw_ex - w * cwm_ex, axis=-1)
    self_term = jnp.sum(w**2 * interval, axis=-1) / 3.0
    return jnp.mean(pairwise + self_term)


def orientation_loss(weights: jax.Array, normals: jax.Array, view_dirs: jax.Array) -> jax.Array:
    """Ref-NeRF orientation loss: penalize normals facing away from camera.
    weights: (n, S); normals: (n, S, 3); view_dirs: (n, 3)."""
    n_dot_v = jnp.sum(normals * view_dirs[..., None, :], axis=-1)
    return jnp.mean(weights * jnp.clip(n_dot_v, 0.0, None) ** 2)


def pred_normal_loss(weights: jax.Array, normals: jax.Array, pred_normals: jax.Array) -> jax.Array:
    return jnp.mean(
        weights * (1.0 - jnp.sum(normals * pred_normals, axis=-1))
    )
