"""Two-kernel megafused emitter query: the entire nerfacto radiance
evaluation in VMEM.

The staged serving path (ops/fused_field.make_fused_radiance_query) still
round-trips every inter-stage array through HBM: RaySamples pytrees from
spaced/pdf sampling (~200 MB of broadcast frustums per 2^16-ray query),
densities, transmittance weights, CDFs. Measured on a v5e chip those
stages cost ~13 ms of the 49.6 ms query on top of the irreducible MLP
and inverse-CDF arithmetic.

Here the whole pipeline is TWO Pallas kernels over 128-ray tiles
(128 rays = one full lane group, so (S, 128) <-> (S*128,) reshapes are
layout no-ops):

  kernel A (proposals): uniform spacing bins -> L0 density MLP ->
    transmittance scan (Hillis-Steele over sublane rows) -> inverse CDF
    (sum of clamped ramps, chunked over input segments) -> L1 density MLP
    -> second scan + inverse CDF -> final spacing bins (S2+1, 128).
  kernel B (field): bins -> positions -> base MLP + SH/appearance head ->
    weights scan -> composite + last-sample background -> rgb (3, 128).

Only (49, N) spacing bins cross HBM between the kernels; o/d/near/far
(3+3+1+1 rows) are the only per-ray inputs. Sampling matches the staged
path's deterministic (key=None) serving mode: bin centers, no jitter
(ops/samplers.py spaced_sample/sample_pdf with key=None).

Gradients: like the staged kernels, wrapped in jax.custom_vjp whose
backward recomputes through the plain-jnp staged path (same math graph).

Reference: this replaces tiny-cuda-nn serving of
nerfstudio/models/base_model.py get_rgb_for_camera_ray_bundle hot loop
(SURVEY.md §3.2 hot loop #3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_field import (
    SAFE_EXP_MAX,
    _contract_and_select,
    _freq_rows_fmajor,
    _freqs_of,
    _interpret,
    _mlp_params,
    _mlp_rowsT,
    _sh4_rows,
    fmajor_permutation,
)

TILE_RAYS = 128  # one full lane group: (S, 128)->(S*128,) reshape is free
_EPS = 1e-5  # sample_pdf eps
_HIST_PAD = 0.01  # sample_pdf histogram_padding


# ---------------------------------------------------------------------------
# in-kernel building blocks (everything in (rows, 128-lanes) orientation)
# ---------------------------------------------------------------------------


def _spacing_pw(t):
    """UniformLinDispPiecewise spacing (ops/samplers.spacing_piecewise)."""
    return jnp.where(t < 1.0, t / 2.0, 1.0 - 1.0 / (2.0 * jnp.maximum(t, 1e-10)))


def _spacing_pw_inv(s):
    return jnp.where(s < 0.5, 2.0 * s, 1.0 / jnp.maximum(2.0 - 2.0 * s, 1e-10))


def _row_iota(n_rows: int, r: int) -> jax.Array:
    """(n_rows, r) float32 row indices 0..n_rows-1 (tpu.iota is int-only)."""
    return jax.lax.broadcasted_iota(jnp.int32, (n_rows, r), 0).astype(jnp.float32)


def _cumsum_rows(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum over the ROW (sublane) axis: Hillis-Steele,
    log2(S) shifted adds. x: (S, R)."""
    s = x.shape[0]
    k = 1
    while k < s:
        x = x + jnp.concatenate([jnp.zeros_like(x[:k]), x[:-k]], axis=0)
        k *= 2
    return x


def _weights_rows(dens: jax.Array, deltas: jax.Array) -> jax.Array:
    """Volume-rendering weights (cameras/rays.RaySamples.get_weights) in
    (S, R) orientation: w = (1-exp(-sigma*delta)) * exp(-excl_cumsum)."""
    dd = dens * deltas
    alphas = 1.0 - jnp.exp(-dd)
    excl = _cumsum_rows(jnp.concatenate([jnp.zeros_like(dd[:1]), dd[:-1]], 0))
    return alphas * jnp.exp(-excl)


def _resample_rows(
    weights: jax.Array, sbins: jax.Array, n_out: int
) -> jax.Array:
    """Deterministic inverse-CDF resampling (ops/samplers.sample_pdf with
    key=None), (S_in, R) weights + (S_in+1, R) spacing bins ->
    (n_out+1, R) new spacing bins.

    The piecewise-linear inverse CDF is evaluated as a TELESCOPED sum of
    relu ramps: with g[s] = d_bins[s]/d_cdf[s] (the per-segment slope) the
    clamped-ramp sum  sum_s d_bins[s]*clip((u-cdf[s])*inv[s], 0, 1)
    telescopes (c_hi[s] == c_lo[s+1]) into

        sum_{s=0..S} coef[s] * relu(u - cdf[s]),
        coef = [g0, g1-g0, ..., g_{S-1}-g_{S-2}, -g_{S-1}],

    which is 4 VPU ops per (out, seg) cell (sub, max, mul, reduce-add)
    instead of 6 — and the resample is the measured hot spot of the
    proposal megakernel (~14.5 of 21.5 ms at the bench config), purely
    VPU-bound. The histogram padding lower-bounds d_cdf (>= hist_pad /
    (1 + hist_pad*S) since transmittance weights sum to <= 1), so the
    slopes — and the cancellation error of the telescoped form — stay
    bounded (~1e-4 of the spacing range in f32).

    The u grid is deterministic (serving mode, key=None), so each output
    row's u_i enters as a PYTHON SCALAR over an unrolled row loop: every
    pass is a native 2D (S+1, R) op with scalar broadcast — measured 19%
    faster than 3D (out, chunk, R) broadcast tiles on v5e."""
    s_in, r = weights.shape
    w = weights + _HIST_PAD
    w_sum = jnp.sum(w, axis=0, keepdims=True)  # (1, R)
    padding = jnp.maximum(_EPS - w_sum, 0.0)
    w = w + padding / s_in
    w_sum = w_sum + padding
    pdf = w / w_sum  # (S_in, R)
    incl = _cumsum_rows(pdf)
    cdf = jnp.concatenate(
        [jnp.zeros((1, r), jnp.float32), jnp.minimum(1.0, incl[:-1]),
         jnp.ones((1, r), jnp.float32)], axis=0,
    )  # (S_in+1, R)

    d_bins = sbins[1:] - sbins[:-1]  # (S_in, R)
    d_cdf = cdf[1:] - cdf[:-1]
    g = d_bins / jnp.maximum(d_cdf, _EPS)  # (S_in, R) slopes
    zero = jnp.zeros((1, r), jnp.float32)
    coef = jnp.concatenate([g, zero], 0) - jnp.concatenate([zero, g], 0)

    # deterministic u grid: linspace(0, 1-eps, n_out+1) + 1/(2(n_out+1))
    step = (1.0 - _EPS) / n_out
    rows = []
    for i in range(n_out + 1):
        u_i = float(i) * step + 1.0 / (2.0 * (n_out + 1))
        rows.append(jnp.sum(coef * jnp.maximum(u_i - cdf, 0.0), axis=0))
    return sbins[:1] + jnp.stack(rows, axis=0)


def _density_rows(
    ebins, o, d, ws, bs, *, num_freqs, aabb_lo, aabb_inv_ext, disable_box,
    avg_density, subtile,
):
    """(S+1, R) euclidean bins -> (S, R) densities via the freq MLP, run
    in `subtile`-sample slices to bound VMEM."""
    s, r = ebins.shape[0] - 1, ebins.shape[1]
    mid = (ebins[:-1] + ebins[1:]) / 2.0  # (S, R)
    pos = o[:, None, :] + d[:, None, :] * mid[None]  # (3, S, R)
    pos = pos.reshape(3, s * r)  # layout no-op when R == 128
    outs = []
    for t0 in range(0, s * r, subtile):
        x2, keep = _contract_and_select(
            pos[:, t0 : t0 + subtile], aabb_lo, aabb_inv_ext, disable_box
        )
        enc = _freq_rows_fmajor(x2, num_freqs)  # first-layer W pre-permuted
        raw = _mlp_rowsT(enc, ws, bs)  # (1, subtile)
        dens = avg_density * jnp.exp(jnp.minimum(raw[0] - 1.0, SAFE_EXP_MAX))
        outs.append(jnp.where(keep, dens, 0.0))
    return jnp.concatenate(outs, axis=0).reshape(s, r)


# ---------------------------------------------------------------------------
# kernel A: both proposal levels -> final spacing bins
# ---------------------------------------------------------------------------


def _proposal_kernel(
    o_ref, d_ref, near_ref, far_ref, *refs,
    n_w0, n_w1, s0, s1, s2, freqs0, freqs1,
    aabb_lo, aabb_inv_ext, disable_box, avg_density,
):
    w0 = [r[:] for r in refs[:n_w0]]
    b0 = [r[:] for r in refs[n_w0 : 2 * n_w0]]
    w1 = [r[:] for r in refs[2 * n_w0 : 2 * n_w0 + n_w1]]
    b1 = [r[:] for r in refs[2 * n_w0 + n_w1 : 2 * n_w0 + 2 * n_w1]]
    out_ref = refs[2 * n_w0 + 2 * n_w1]

    o = o_ref[:]  # (3, R)
    d = d_ref[:]
    r = o.shape[1]
    s_near = _spacing_pw(near_ref[:])  # (1, R)
    s_far = _spacing_pw(far_ref[:])

    dens_kw = dict(
        aabb_lo=aabb_lo, aabb_inv_ext=aabb_inv_ext,
        disable_box=disable_box, avg_density=avg_density, subtile=8192,
    )

    # L0: uniform spacing bins (s0+1, R)
    sbins0 = _row_iota(s0 + 1, r) / float(s0)
    ebins0 = _spacing_pw_inv(sbins0 * (s_far - s_near) + s_near)
    dens0 = _density_rows(ebins0, o, d, w0, b0, num_freqs=freqs0, **dens_kw)
    wts0 = _weights_rows(dens0, ebins0[1:] - ebins0[:-1])
    sbins1 = _resample_rows(wts0, sbins0, s1)

    # L1
    ebins1 = _spacing_pw_inv(sbins1 * (s_far - s_near) + s_near)
    dens1 = _density_rows(ebins1, o, d, w1, b1, num_freqs=freqs1, **dens_kw)
    wts1 = _weights_rows(dens1, ebins1[1:] - ebins1[:-1])
    out_ref[:, :] = _resample_rows(wts1, sbins1, s2)


# ---------------------------------------------------------------------------
# kernel B: field + compositing
# ---------------------------------------------------------------------------


def _field_composite_kernel(
    sbins_ref, o_ref, d_ref, near_ref, far_ref, emb_ref, *refs,
    n_base, n_head, n_emb, s2, freqs, aabb_lo, aabb_inv_ext, disable_box,
    avg_density, hdr, rgb_bias,
):
    bw = [r[:] for r in refs[:n_base]]
    bb = [r[:] for r in refs[n_base : 2 * n_base]]
    hw = [r[:] for r in refs[2 * n_base : 2 * n_base + n_head]]
    hb = [r[:] for r in refs[2 * n_base + n_head : 2 * n_base + 2 * n_head]]
    out_ref = refs[2 * n_base + 2 * n_head]

    o = o_ref[:]
    d = d_ref[:]
    r = o.shape[1]
    s_near = _spacing_pw(near_ref[:])
    s_far = _spacing_pw(far_ref[:])
    sbins = sbins_ref[:]  # (s2+1, R)
    ebins = _spacing_pw_inv(sbins * (s_far - s_near) + s_near)

    mid = (ebins[:-1] + ebins[1:]) / 2.0  # (s2, R)
    pos = (o[:, None, :] + d[:, None, :] * mid[None]).reshape(3, s2 * r)
    x2, keep = _contract_and_select(pos, aabb_lo, aabb_inv_ext, disable_box)
    enc = _freq_rows_fmajor(x2, freqs)  # first-layer W pre-permuted
    base = _mlp_rowsT(enc, bw, bb)  # (1+geo, s2*R)
    dens = avg_density * jnp.exp(jnp.minimum(base[0] - 1.0, SAFE_EXP_MAX))
    dens = jnp.where(keep, dens, 0.0).reshape(s2, r)

    dirs = jnp.broadcast_to(d[:, None, :], (3, s2, r)).reshape(3, s2 * r)
    sh = _sh4_rows(dirs)  # (16, s2*R)
    rows = [sh, base[1:]]
    if n_emb:
        emb = emb_ref[0, :n_emb]  # (E,)
        rows.append(jnp.broadcast_to(emb[:, None], (n_emb, s2 * r)))
    h_in = jnp.concatenate(rows, axis=0)
    raw = _mlp_rowsT(h_in, hw, hb)  # (3, s2*R)
    if hdr:
        rgb2d = jnp.exp(jnp.minimum(raw + rgb_bias, SAFE_EXP_MAX))
    else:
        rgb2d = jax.nn.sigmoid(raw)
    # last-sample background: static lane slice of the 2D layout (a 3D
    # middle-dim index lowers to an unsupported dynamic_slice)
    bg = rgb2d[:, (s2 - 1) * r :]  # (3, R)
    rgb = rgb2d.reshape(3, s2, r)

    w = _weights_rows(dens, ebins[1:] - ebins[:-1])  # (s2, R)
    acc = jnp.sum(w, axis=0)  # (R,)
    comp = jnp.sum(w.reshape(1, s2, r) * rgb, axis=1)  # (3, R)
    out_ref[:, :] = comp + bg * (1.0 - acc).reshape(1, r)


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------


def make_mega_radiance_query(model, *, disable_box=None):
    """Drop-in replacement for fused_field.make_fused_radiance_query using
    the two megakernels. Same contract:
    query(params, rays, camera_index=None) -> rgb (n, 3)."""
    assert model.implementation == "freq", "mega path is freq-only"
    from .fused_field import make_fused_radiance_query

    aabb = jnp.asarray(model.aabb, jnp.float32)
    aabb_lo = tuple(float(x) for x in aabb[0])
    aabb_inv_ext = tuple(1.0 / float(hi - lo) for lo, hi in zip(aabb[0], aabb[1]))
    dbox = (
        tuple(tuple(float(x) for x in row) for row in disable_box)
        if disable_box is not None
        else None
    )
    s0, s1 = model.num_proposal_samples
    s2 = model.num_nerf_samples

    # plain staged path for the custom_vjp backward (exact same math)
    staged = make_fused_radiance_query(model, disable_box=disable_box)

    def _forward_impl(params, rays, camera_index):
        p = params["params"]
        n = rays.origins.shape[0]
        np_ = ((n + TILE_RAYS - 1) // TILE_RAYS) * TILE_RAYS
        pad = np_ - n

        def pad_t(x, fill=0.0):  # (n, k) -> (k, np_)
            xt = x.T
            if pad:
                xt = jnp.pad(xt, ((0, 0), (0, pad)), constant_values=fill)
            return xt

        o_t = pad_t(rays.origins)
        d_t = pad_t(rays.directions, fill=1.0)
        near_t = pad_t(rays.nears, fill=0.1)
        far_t = pad_t(rays.fars, fill=0.2)

        def _perm_first(ws, freqs):
            # kernels build f-major encoding rows; permute layer-1 weight
            # rows to match (fused_field.fmajor_permutation)
            perm = jnp.asarray(fmajor_permutation(freqs), jnp.int32)
            return (ws[0][perm],) + tuple(ws[1:])

        ws0, bs0 = _mlp_params(p["proposal_0"]["mlp"])
        ws1, bs1 = _mlp_params(p["proposal_1"]["mlp"])
        prop_freqs = [_freqs_of(ws0[0]), _freqs_of(ws1[0])]
        ws0 = _perm_first(ws0, prop_freqs[0])
        ws1 = _perm_first(ws1, prop_freqs[1])
        full = lambda shape: pl.BlockSpec(
            shape, functools.partial(lambda i, _r: (0,) * _r, _r=len(shape)),
            memory_space=pltpu.VMEM,
        )
        tile = lambda rows: pl.BlockSpec(
            (rows, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        kern_a = functools.partial(
            _proposal_kernel,
            n_w0=len(ws0), n_w1=len(ws1), s0=s0, s1=s1, s2=s2,
            freqs0=prop_freqs[0], freqs1=prop_freqs[1],
            aabb_lo=aabb_lo, aabb_inv_ext=aabb_inv_ext, disable_box=dbox,
            avg_density=1.0,
        )
        sbins2 = pl.pallas_call(
            kern_a,
            grid=(np_ // TILE_RAYS,),
            in_specs=[
                tile(3), tile(3), tile(1), tile(1),
                *[full(w.shape) for w in ws0], *[full(b.shape) for b in bs0],
                *[full(w.shape) for w in ws1], *[full(b.shape) for b in bs1],
            ],
            out_specs=tile(s2 + 1),
            out_shape=jax.ShapeDtypeStruct((s2 + 1, np_), jnp.float32),
            interpret=_interpret(),
        )(o_t, d_t, near_t, far_t, *ws0, *bs0, *ws1, *bs1)

        f = p["field"]
        bws, bbs = _mlp_params(f["base_mlp"])
        field_freqs = _freqs_of(bws[0])
        bws = _perm_first(bws, field_freqs)
        hws, hbs = _mlp_params(f["head_mlp"])
        if model.appearance_embedding_dim > 0:
            table = f["appearance_embedding"]["embedding"]
            cam = camera_index if camera_index is not None else 0
            emb = table[cam]
        else:
            emb = jnp.zeros((0,), jnp.float32)
        n_emb = emb.shape[0]
        emb2 = emb[None, :] if n_emb else jnp.zeros((1, 1), jnp.float32)
        kern_b = functools.partial(
            _field_composite_kernel,
            n_base=len(bws), n_head=len(hws), n_emb=n_emb, s2=s2,
            freqs=field_freqs,
            aabb_lo=aabb_lo, aabb_inv_ext=aabb_inv_ext, disable_box=dbox,
            avg_density=1.0, hdr=model.hdr, rgb_bias=model.rgb_bias,
        )
        rgb_t = pl.pallas_call(
            kern_b,
            grid=(np_ // TILE_RAYS,),
            in_specs=[
                tile(s2 + 1), tile(3), tile(3), tile(1), tile(1),
                full(emb2.shape),
                *[full(w.shape) for w in bws], *[full(b.shape) for b in bbs],
                *[full(w.shape) for w in hws], *[full(b.shape) for b in hbs],
            ],
            out_specs=tile(3),
            out_shape=jax.ShapeDtypeStruct((3, np_), jnp.float32),
            interpret=_interpret(),
        )(sbins2, o_t, d_t, near_t, far_t, emb2, *bws, *bbs, *hws, *hbs)
        return rgb_t[:, :n].T

    @jax.custom_vjp
    def query(params, rays, camera_index):
        return _forward_impl(params, rays, camera_index)

    def _fwd(params, rays, camera_index):
        return query(params, rays, camera_index), (params, rays, camera_index)

    def _bwd(res, g):
        params, rays, camera_index = res
        _, vjp = jax.vjp(lambda pr, rb: staged(pr, rb, camera_index), params, rays)
        gp, gr = vjp(g)
        return gp, gr, None

    query.defvjp(_fwd, _bwd)

    def wrapped(params, rays, camera_index=None):
        return query(params, rays, camera_index)

    return wrapped
