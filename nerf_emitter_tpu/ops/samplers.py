"""Ray samplers: spaced/uniform, PDF (inverse-CDF), and proposal sampling.

Re-design of nerfstudio/model_components/ray_samplers.py for JAX. The
reference threads seeded per-device `torch.Generator`s whose states are
captured/restored so the emitter-query backward pass replays identical
samples (ray_samplers.py:43-46, base_model.py:296-312). With explicit
`jax.random` keys that machinery disappears: the caller passes the same key
to get the same samples.

Everything is shape-static: n_samples are python ints, so the whole
proposal-sampling chain traces once under jit.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..cameras.rays import RayBundle, RaySamples

# ---------------------------------------------------------------------------
# spacing functions: map euclidean distance t -> warped s and back.
# ---------------------------------------------------------------------------


def spacing_linear(t):
    return t


def spacing_linear_inv(s):
    return s


def spacing_reciprocal(t):
    return 1.0 / jnp.maximum(t, 1e-10)


def spacing_reciprocal_inv(s):
    return 1.0 / jnp.maximum(s, 1e-10)


def spacing_piecewise(t):
    """Linear for t<1, disparity beyond — nerfacto's UniformLinDispPiecewise."""
    return jnp.where(t < 1.0, t / 2.0, 1.0 - 1.0 / (2.0 * jnp.maximum(t, 1e-10)))


def spacing_piecewise_inv(s):
    return jnp.where(s < 0.5, 2.0 * s, 1.0 / jnp.maximum(2.0 - 2.0 * s, 1e-10))


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------


def _searchsorted_right(sorted_arr: jax.Array, queries: jax.Array) -> jax.Array:
    """Rowwise searchsorted(side='right'): sorted_arr (N, B), queries
    (N, S) -> int32 (N, S). Compare-and-sum; count of entries <= query."""
    return jnp.sum(
        (sorted_arr[..., None, :] <= queries[..., :, None]).astype(jnp.int32),
        axis=-1,
    )


def spaced_sample(
    ray_bundle: RayBundle,
    num_samples: int,
    *,
    key: Optional[jax.Array] = None,
    spacing_fn: Callable = spacing_piecewise,
    spacing_fn_inv: Callable = spacing_piecewise_inv,
    single_jitter: bool = True,
) -> RaySamples:
    """Uniform-in-warped-space sampling between near and far.

    key=None -> deterministic bin centers (eval); key given -> stratified.
    """
    n_rays = ray_bundle.origins.shape[0]
    bins = jnp.linspace(0.0, 1.0, num_samples + 1)  # (S+1,)
    bins = jnp.broadcast_to(bins, (n_rays, num_samples + 1))

    if key is not None:
        if single_jitter:
            jitter = jax.random.uniform(key, (n_rays, 1))
        else:
            jitter = jax.random.uniform(key, (n_rays, num_samples + 1))
        bin_centers = (bins[..., 1:] + bins[..., :-1]) / 2.0
        bin_upper = jnp.concatenate([bin_centers, bins[..., -1:]], axis=-1)
        bin_lower = jnp.concatenate([bins[..., :1], bin_centers], axis=-1)
        bins = bin_lower + (bin_upper - bin_lower) * jitter

    s_near = spacing_fn(ray_bundle.nears)  # (n_rays, 1)
    s_far = spacing_fn(ray_bundle.fars)
    euclid_bins = spacing_fn_inv(bins * (s_far - s_near) + s_near)  # (n_rays, S+1)

    return ray_bundle.get_ray_samples(
        bin_starts=euclid_bins[..., :-1],
        bin_ends=euclid_bins[..., 1:],
        spacing_starts=bins[..., :-1],
        spacing_ends=bins[..., 1:],
    )


def sample_pdf(
    ray_bundle: RayBundle,
    ray_samples: RaySamples,
    weights: jax.Array,
    num_samples: int,
    *,
    key: Optional[jax.Array] = None,
    spacing_fn_inv: Callable = spacing_piecewise_inv,
    histogram_padding: float = 0.01,
    single_jitter: bool = True,
    include_original: bool = False,
) -> RaySamples:
    """Inverse-CDF resampling of `num_samples` new bins from existing weights.

    weights: (n_rays, n_bins); existing spacing bins come from ray_samples.
    """
    eps = 1e-5
    # Resampling is stop-gradient wrt the weights (mip-NeRF 360 convention):
    # proposal nets learn only through the interlevel loss, and pow(w, anneal)
    # has an infinite derivative at w=0. Ray-geometry gradients (for the
    # emitter-query backward wrt o,v) still flow via near/far and positions.
    w = jax.lax.stop_gradient(weights) + histogram_padding  # (n_rays, n_bins)
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    padding = jnp.maximum(eps - w_sum, 0.0)
    w = w + padding / w.shape[-1]
    w_sum = w_sum + padding

    pdf = w / w_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], axis=-1
    )  # (n_rays, n_bins+1)

    n_rays = cdf.shape[0]
    if key is not None:
        if single_jitter:
            rand = jax.random.uniform(key, (n_rays, 1)) / (num_samples + 1)
        else:
            rand = jax.random.uniform(key, (n_rays, num_samples + 1)) / (num_samples + 1)
        u = jnp.linspace(0.0, 1.0 - 1.0 / (num_samples + 1), num_samples + 1)
        u = jnp.broadcast_to(u, (n_rays, num_samples + 1)) + rand
    else:
        u = jnp.linspace(0.0, 1.0 - eps, num_samples + 1) + 1.0 / (2 * (num_samples + 1))
        u = jnp.broadcast_to(u, (n_rays, num_samples + 1))

    existing_bins = jnp.concatenate(
        [ray_samples.spacing_starts, ray_samples.spacing_ends[..., -1:]],
        axis=-1,
    )  # (n_rays, n_bins+1)

    # Inverse-CDF lookup WITHOUT gathers. TPU has no gather engine: both a
    # vmapped binary search (sequential while-loops, ~220ms here) and
    # take_along_axis (row gathers, ~60ms) are poison. The piecewise-linear
    # inverse of a monotone CDF is EXACTLY a sum of clamped ramps,
    #   t(u) = bins[0] + sum_b (bins[b+1]-bins[b]) *
    #                    clamp((u - cdf[b]) / (cdf[b+1]-cdf[b]), 0, 1),
    # (full segments below u add their whole width, the containing segment
    # adds its fraction, segments above add 0). One fused fma chain over
    # the broadcast (N, S, B) — ~2x fewer VPU ops than bracketing each u
    # with masked max/min reductions, and no edge-case handling at all.
    d_cdf = cdf[..., 1:] - cdf[..., :-1]  # (n_rays, n_bins) >= 0
    d_bins = existing_bins[..., 1:] - existing_bins[..., :-1]
    inv_d_cdf = 1.0 / jnp.maximum(d_cdf, eps)  # empty segments: ramp ~ step
    frac = (u[..., :, None] - cdf[..., None, :-1]) * inv_d_cdf[..., None, :]
    new_bins = existing_bins[..., :1] + jnp.sum(
        d_bins[..., None, :] * jnp.clip(frac, 0.0, 1.0), axis=-1
    )

    if include_original:
        new_bins = jnp.sort(jnp.concatenate([existing_bins, new_bins], axis=-1), axis=-1)

    # normalized spacing [0,1] -> euclidean t via the bundle's near/far
    s_n = _spacing_of(ray_bundle, spacing_fn_inv, new_bins)

    return ray_bundle.get_ray_samples(
        bin_starts=s_n[..., :-1],
        bin_ends=s_n[..., 1:],
        spacing_starts=new_bins[..., :-1],
        spacing_ends=new_bins[..., 1:],
    )


def _spacing_of(ray_bundle: RayBundle, spacing_fn_inv: Callable, s_bins: jax.Array) -> jax.Array:
    """normalized spacing in [0,1] -> euclidean t, using the bundle's near/far."""
    # The forward spacing_fn corresponding to spacing_fn_inv:
    if spacing_fn_inv is spacing_piecewise_inv:
        spacing_fn = spacing_piecewise
    elif spacing_fn_inv is spacing_linear_inv:
        spacing_fn = spacing_linear
    elif spacing_fn_inv is spacing_reciprocal_inv:
        spacing_fn = spacing_reciprocal
    else:  # pragma: no cover
        raise ValueError("unknown spacing_fn_inv")
    s_near = spacing_fn(ray_bundle.nears)
    s_far = spacing_fn(ray_bundle.fars)
    return spacing_fn_inv(s_bins * (s_far - s_near) + s_near)


# ---------------------------------------------------------------------------
# proposal sampling (nerfacto)
# ---------------------------------------------------------------------------


def proposal_sample(
    ray_bundle: RayBundle,
    density_fns: Sequence[Callable[[jax.Array, Optional[jax.Array]], jax.Array]],
    num_proposal_samples: Sequence[int],
    num_nerf_samples: int,
    *,
    key: Optional[jax.Array] = None,
    proposal_weights_anneal: float | jax.Array = 1.0,
    single_jitter: bool = True,
    spacing_fn: Callable = spacing_piecewise,
    spacing_fn_inv: Callable = spacing_piecewise_inv,
) -> tuple[RaySamples, list[jax.Array], list[RaySamples]]:
    """Hierarchical proposal sampling (ProposalNetworkSampler, reference
    ray_samplers.py:531-610, annealing per mitsuba_sdf train callbacks).

    density_fns[i](positions, camera_indices) -> densities (n_rays, S_i).
    Returns (final ray_samples, weights_list, samples_list) where the lists
    hold each proposal level's weights/samples for the interlevel loss.
    """
    weights_list: list[jax.Array] = []
    samples_list: list[RaySamples] = []

    n_levels = len(num_proposal_samples)
    keys = (
        list(jax.random.split(key, n_levels + 1))
        if key is not None
        else [None] * (n_levels + 1)
    )

    ray_samples = None
    weights = None
    for i, n_samp in enumerate(num_proposal_samples):
        if i == 0:
            ray_samples = spaced_sample(
                ray_bundle,
                n_samp,
                key=keys[i],
                spacing_fn=spacing_fn,
                spacing_fn_inv=spacing_fn_inv,
                single_jitter=single_jitter,
            )
        else:
            ray_samples = sample_pdf(
                ray_bundle,
                ray_samples,
                weights,
                n_samp,
                key=keys[i],
                spacing_fn_inv=spacing_fn_inv,
                single_jitter=single_jitter,
            )
        positions = ray_samples.frustums.get_positions()
        density = density_fns[i](positions, ray_samples.camera_indices)
        w = ray_samples.get_weights(density)
        # annealed weights steer early training toward uniform (anneal in [0,1])
        w_ann = jnp.power(w, proposal_weights_anneal)
        weights_list.append(w)
        samples_list.append(ray_samples)
        weights = w_ann

    final_samples = sample_pdf(
        ray_bundle,
        ray_samples,
        weights,
        num_nerf_samples,
        key=keys[-1],
        spacing_fn_inv=spacing_fn_inv,
        single_jitter=single_jitter,
    )
    return final_samples, weights_list, samples_list
