"""Spherical-covariance Gaussian mixture via EM, in pure JAX.

Re-design of nerfstudio/model_components/gmm_cluster_light.py:41-85, which
fits a pomegranate `GeneralMixtureModel([Normal(covariance_type='sphere')]
x 64)` with multi-trial retry on numerical failure. Here: weighted EM under
`lax.fori_loop` (fixed iteration count, jit-static), k-means++-style seeding
from the weighted points, and degeneracy handling by re-seeding empty
clusters instead of retrying the whole fit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_CLUSTER_DEFAULT = 64


def _log_gauss_sphere(points, means, vars_):
    """log N(x | mu_k, var_k I). points (N,3), means (K,3), vars (K,) ->
    (N, K)."""
    d2 = jnp.sum((points[:, None, :] - means[None, :, :]) ** 2, axis=-1)
    return -0.5 * (d2 / vars_[None, :] + 3.0 * jnp.log(2.0 * jnp.pi * vars_[None, :]))


def fit_spherical_gmm(
    key: jax.Array,
    points: jax.Array,
    weights: jax.Array,
    n_clusters: int = N_CLUSTER_DEFAULT,
    n_iters: int = 30,
    min_var: float = 1e-6,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Weighted EM. points (N, 3); weights (N,) >= 0.
    Returns (means (K,3), mix_weights (K,), stds (K,))."""
    n = points.shape[0]
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)

    # seeding: sample K points proportional to weight
    idx = jax.random.categorical(key, jnp.log(w + 1e-12), shape=(n_clusters,))
    means0 = points[idx]
    # initial var: mean squared distance to nearest seed / 3
    d2 = jnp.sum((points[:, None, :] - means0[None, :, :]) ** 2, axis=-1)
    var0 = jnp.full((n_clusters,), jnp.maximum(jnp.mean(jnp.min(d2, axis=1)), min_var))
    pi0 = jnp.full((n_clusters,), 1.0 / n_clusters)

    def em_step(_, carry):
        means, vars_, pis = carry
        log_p = _log_gauss_sphere(points, means, vars_) + jnp.log(pis + 1e-12)[None, :]
        log_r = log_p - jax.scipy.special.logsumexp(log_p, axis=1, keepdims=True)
        r = jnp.exp(log_r) * w[:, None]  # (N, K) weighted responsibilities
        nk = jnp.sum(r, axis=0)  # (K,)
        safe_nk = jnp.maximum(nk, 1e-12)
        new_means = (r.T @ points) / safe_nk[:, None]
        d2_ = jnp.sum((points[:, None, :] - new_means[None, :, :]) ** 2, axis=-1)
        new_vars = jnp.maximum(jnp.sum(r * d2_, axis=0) / (3.0 * safe_nk), min_var)
        new_pis = nk / jnp.maximum(jnp.sum(nk), 1e-12)
        # re-seed empty clusters at the current heaviest point
        empty = nk < 1e-10
        heavy = points[jnp.argmax(w)]
        new_means = jnp.where(empty[:, None], heavy[None, :], new_means)
        new_vars = jnp.where(empty, var0, new_vars)
        return new_means, new_vars, new_pis

    means, vars_, pis = jax.lax.fori_loop(
        0, n_iters, em_step, (means0, var0, pi0)
    )
    return means, pis, jnp.sqrt(vars_)
