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
import os

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


def _resample_prep(weights: jax.Array, sbins: jax.Array):
    """CDF + telescoped ramp coefficients for `_resample_rows` (split out so
    the pipelined megakernel can emit the row passes in chunks)."""
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
    return coef, cdf


def _resample_emit(coef, cdf, n_out: int, lo: int, hi: int):
    """Rows lo..hi-1 of the telescoped ramp-sum inverse CDF (the unrolled
    scalar-u passes of `_resample_rows`)."""
    step = (1.0 - _EPS) / n_out
    rows = []
    for i in range(lo, hi):
        u_i = float(i) * step + 1.0 / (2.0 * (n_out + 1))
        rows.append(jnp.sum(coef * jnp.maximum(u_i - cdf, 0.0), axis=0))
    return rows


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
    coef, cdf = _resample_prep(weights, sbins)
    rows = _resample_emit(coef, cdf, n_out, 0, n_out + 1)
    return sbins[:1] + jnp.stack(rows, axis=0)


def _density_subtile(
    pos_cols, ws, bs, *, num_freqs, aabb_lo, aabb_inv_ext, disable_box,
    avg_density,
):
    """One `subtile`-sample slice of `_density_rows`: pos (3, t) -> (t,)."""
    x2, keep = _contract_and_select(pos_cols, aabb_lo, aabb_inv_ext, disable_box)
    enc = _freq_rows_fmajor(x2, num_freqs)  # first-layer W pre-permuted
    raw = _mlp_rowsT(enc, ws, bs)  # (1, t)
    dens = avg_density * jnp.exp(jnp.minimum(raw[0] - 1.0, SAFE_EXP_MAX))
    return jnp.where(keep, dens, 0.0)


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
        outs.append(_density_subtile(
            pos[:, t0 : t0 + subtile], ws, bs, num_freqs=num_freqs,
            aabb_lo=aabb_lo, aabb_inv_ext=aabb_inv_ext,
            disable_box=disable_box, avg_density=avg_density,
        ))
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
# pipelined single kernel: A(tile i) interleaved with B(tile i-1)
# ---------------------------------------------------------------------------


def _interleave_stages(a_list, b_list):
    """Proportional round-robin merge preserving each list's order, starting
    with b_list[0] (B's scratch read must precede A's scratch write)."""
    out = [b_list[0]]
    b_rest = b_list[1:]
    ia = ib = 0
    la, lb = len(a_list), len(b_rest)
    while ia < la or ib < lb:
        if ib < lb and (ia >= la or ib * la <= ia * lb):
            out.append(b_rest[ib])
            ib += 1
        else:
            out.append(a_list[ia])
            ia += 1
    return out


def _mega_pipeline_kernel(
    o_ref, d_ref, near_ref, far_ref, emb_ref, *refs,
    n_w0, n_w1, n_base, n_head, n_emb, s0, s1, s2,
    freqs0, freqs1, freqs_f, aabb_lo, aabb_inv_ext, disable_box,
    avg_density, hdr, rgb_bias, mxu_chunk=1,
):
    """Software-pipelined fusion of kernels A and B: one grid step runs the
    FIELD+COMPOSITE of tile i-1 (MXU-heavy: the 5-layer base MLP is the
    chip's FLOP floor) interleaved with the PROPOSALS of tile i (VPU-heavy:
    the inverse-CDF ramp sums are issue-bound). Tile i's spacing bins and
    ray rows hand over through a VMEM scratch that B reads at the top of
    the step and A overwrites at the bottom, so the in-order core always
    has independent VPU work queued behind every MXU layer.

    Grid is n_tiles+1: step 0 runs B on zero-initialized scratch (its
    output block is re-written at step 1 before the deferred flush), step
    n_tiles re-runs A on the clamped last tile (its scratch is never read).
    Math per tile is emission-order identical to the two-kernel path.
    """
    k = 0
    w0 = refs[k : k + n_w0]; k += n_w0
    b0 = refs[k : k + n_w0]; k += n_w0
    w1 = refs[k : k + n_w1]; k += n_w1
    b1 = refs[k : k + n_w1]; k += n_w1
    bw = refs[k : k + n_base]; k += n_base
    bb = refs[k : k + n_base]; k += n_base
    hw = refs[k : k + n_head]; k += n_head
    hb = refs[k : k + n_head]; k += n_head
    out_ref = refs[k]
    scr_ref = refs[k + 1]  # rows: 0:3 o, 3:6 d, 6 s_near, 7 s_far, 8: sbins

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        scr_ref[:, :] = jnp.zeros((8 + s2 + 1, TILE_RAYS), jnp.float32)

    r = TILE_RAYS
    subtile = 8192
    dens_kw = dict(
        aabb_lo=aabb_lo, aabb_inv_ext=aabb_inv_ext, disable_box=disable_box,
        avg_density=avg_density,
    )

    # ---- B stages: field + composite of the PREVIOUS tile from scratch
    B = {}

    def b_load():
        s = scr_ref[:, :]
        B["o"], B["d"] = s[0:3], s[3:6]
        B["sn"], B["sf"] = s[6:7], s[7:8]
        sbins = s[8 : 8 + s2 + 1]
        eb = _spacing_pw_inv(sbins * (B["sf"] - B["sn"]) + B["sn"])
        B["ebins"] = eb
        mid = (eb[:-1] + eb[1:]) / 2.0
        B["pos"] = (
            B["o"][:, None, :] + B["d"][:, None, :] * mid[None]
        ).reshape(3, s2 * r)

    def b_enc():
        x2, keep = _contract_and_select(
            B["pos"], aabb_lo, aabb_inv_ext, disable_box
        )
        B["keep"] = keep
        B["h"] = _freq_rows_fmajor(x2, freqs_f).astype(jnp.bfloat16)

    def _layer(w_ref, b_ref, h):
        out = jax.lax.dot_general(
            w_ref[:].astype(jnp.bfloat16), h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out + b_ref[:].astype(jnp.float32)[:, None]

    def _b_hidden(w_ref, b_ref):
        def f():
            B["h"] = jnp.maximum(_layer(w_ref, b_ref, B["h"]).astype(jnp.bfloat16), 0)
        return f

    def _b_hidden_chunked(w_ref, b_ref, n_chunks):
        """The same hidden layer as _b_hidden, emitted as n_chunks stages
        each computing a column slice of the output, so the interleaver can
        slot A's VPU ramp work between MXU blocks (Mosaic otherwise
        schedules the full (256, S*r) dot_general as one contiguous MXU
        region). Bit-identical: column slicing commutes with the matmul."""
        width = s2 * r
        # keep slice boundaries on 128-lane multiples; dedupe (floor-to-128
        # repeats a boundary when n_chunks > width/128, which would emit a
        # zero-width dot_general Mosaic rejects)
        bounds = sorted(
            {((width * c // n_chunks) // 128) * 128 for c in range(n_chunks)}
        )
        bounds.append(width)
        n_real = len(bounds) - 1
        assert all(lo < hi for lo, hi in zip(bounds, bounds[1:])), bounds
        parts = {}

        def make(ci, lo, hi):
            def f():
                if ci == 0:
                    parts["in"] = B["h"]
                out = _layer(w_ref, b_ref, parts["in"][:, lo:hi])
                parts[ci] = jnp.maximum(out.astype(jnp.bfloat16), 0)
                if ci == n_real - 1:
                    B["h"] = jnp.concatenate(
                        [parts[c] for c in range(n_real)], axis=1
                    )
                    parts.clear()
            return f

        return [make(ci, bounds[ci], bounds[ci + 1]) for ci in range(n_real)]

    def b_base_out():  # 256 -> 1+geo, stays f32 (matches _mlp_rowsT tail)
        B["base"] = _layer(bw[-1], bb[-1], B["h"])

    def b_post():
        base = B["base"]
        dens = avg_density * jnp.exp(jnp.minimum(base[0] - 1.0, SAFE_EXP_MAX))
        B["dens"] = jnp.where(B["keep"], dens, 0.0).reshape(s2, r)
        dirs = jnp.broadcast_to(B["d"][:, None, :], (3, s2, r)).reshape(3, s2 * r)
        rows = [_sh4_rows(dirs), base[1:]]
        if n_emb:
            emb = emb_ref[0, :n_emb]
            rows.append(jnp.broadcast_to(emb[:, None], (n_emb, s2 * r)))
        B["h"] = jnp.concatenate(rows, axis=0).astype(jnp.bfloat16)

    def b_head_out():  # <=4-wide head: VPU reduce (matches _mlp_rowsT tail)
        w, b = hw[-1][:], hb[-1][:]
        h = B["h"].astype(jnp.float32)
        raws = [
            jnp.sum(w[:, o].astype(jnp.float32)[:, None] * h, axis=0)
            + b[o].astype(jnp.float32)
            for o in range(w.shape[1])
        ]
        B["raw"] = jnp.stack(raws, axis=0)

    def b_comp():
        raw = B["raw"]
        if hdr:
            rgb2d = jnp.exp(jnp.minimum(raw + rgb_bias, SAFE_EXP_MAX))
        else:
            rgb2d = jax.nn.sigmoid(raw)
        bg = rgb2d[:, (s2 - 1) * r :]  # (3, R)
        rgb = rgb2d.reshape(3, s2, r)
        w_ = _weights_rows(B["dens"], B["ebins"][1:] - B["ebins"][:-1])
        acc = jnp.sum(w_, axis=0)
        comp = jnp.sum(w_.reshape(1, s2, r) * rgb, axis=1)
        out_ref[:, :] = comp + bg * (1.0 - acc).reshape(1, r)

    b_stages = [b_load, b_enc]
    for wr, br in zip(bw[:-1], bb[:-1]):
        if mxu_chunk > 1:
            b_stages += _b_hidden_chunked(wr, br, mxu_chunk)
        else:
            b_stages.append(_b_hidden(wr, br))
    b_stages += [b_base_out, b_post]
    for wr, br in zip(hw[:-1], hb[:-1]):
        b_stages.append(_b_hidden(wr, br))
    b_stages += [b_head_out, b_comp]

    # ---- A stages: proposals of THIS tile -> scratch
    A = {}
    wv0 = [x[:] for x in w0]
    bv0 = [x[:] for x in b0]
    wv1 = [x[:] for x in w1]
    bv1 = [x[:] for x in b1]

    def a_start():
        A["o"], A["d"] = o_ref[:], d_ref[:]
        A["sn"], A["sf"] = _spacing_pw(near_ref[:]), _spacing_pw(far_ref[:])
        A["sbins0"] = _row_iota(s0 + 1, r) / float(s0)
        eb = _spacing_pw_inv(A["sbins0"] * (A["sf"] - A["sn"]) + A["sn"])
        A["ebins0"] = eb
        mid = (eb[:-1] + eb[1:]) / 2.0
        A["pos"] = (
            A["o"][:, None, :] + A["d"][:, None, :] * mid[None]
        ).reshape(3, s0 * r)
        A["dens"] = []

    def _a_dens(t0, ws, bs, freqs):
        def f():
            A["dens"].append(_density_subtile(
                A["pos"][:, t0 : t0 + subtile], ws, bs, num_freqs=freqs,
                **dens_kw,
            ))
        return f

    def _a_scan(s_level, sbins_key):
        def f():
            dens = jnp.concatenate(A["dens"], axis=0).reshape(s_level, r)
            eb = A["ebins0" if sbins_key == "sbins0" else "ebins1"]
            wts = _weights_rows(dens, eb[1:] - eb[:-1])
            A["coef"], A["cdf"] = _resample_prep(wts, A[sbins_key])
            A["rows"] = []
        return f

    def _a_rows(n_out, lo, hi):
        def f():
            A["rows"] += _resample_emit(A["coef"], A["cdf"], n_out, lo, hi)
        return f

    def _a_fin(src_key, dst_key):
        def f():
            A[dst_key] = A[src_key][:1] + jnp.stack(A["rows"], axis=0)
            if dst_key == "sbins1":
                eb = _spacing_pw_inv(A["sbins1"] * (A["sf"] - A["sn"]) + A["sn"])
                A["ebins1"] = eb
                mid = (eb[:-1] + eb[1:]) / 2.0
                A["pos"] = (
                    A["o"][:, None, :] + A["d"][:, None, :] * mid[None]
                ).reshape(3, s1 * r)
                A["dens"] = []
        return f

    def a_store():
        scr_ref[0:3, :] = A["o"]
        scr_ref[3:6, :] = A["d"]
        scr_ref[6:7, :] = A["sn"]
        scr_ref[7:8, :] = A["sf"]
        scr_ref[8 : 8 + s2 + 1, :] = A["sbins2"]

    a_stages = [a_start]
    a_stages += [_a_dens(t0, wv0, bv0, freqs0) for t0 in range(0, s0 * r, subtile)]
    a_stages.append(_a_scan(s0, "sbins0"))
    chunk = 33
    for lo in range(0, s1 + 1, chunk):
        a_stages.append(_a_rows(s1, lo, min(lo + chunk, s1 + 1)))
    a_stages.append(_a_fin("sbins0", "sbins1"))
    a_stages += [_a_dens(t0, wv1, bv1, freqs1) for t0 in range(0, s1 * r, subtile)]
    a_stages.append(_a_scan(s1, "sbins1"))
    for lo in range(0, s2 + 1, chunk):
        a_stages.append(_a_rows(s2, lo, min(lo + chunk, s2 + 1)))
    a_stages.append(_a_fin("sbins1", "sbins2"))
    a_stages.append(a_store)

    for stage in _interleave_stages(a_stages, b_stages):
        stage()


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------


def make_mega_radiance_query(model, *, disable_box=None, pipelined=None,
                             mxu_chunk=None):
    """Drop-in replacement for fused_field.make_fused_radiance_query using
    the megakernels. Same contract:
    query(params, rays, camera_index=None) -> rgb (n, 3).

    pipelined=True fuses A+B into the software-pipelined single kernel
    (`_mega_pipeline_kernel`); default ON (chip A/B, v5e: 25.53 ms
    pipelined vs 26.69 ms two-kernel per 2^16-ray query — 2.57M vs 2.46M
    rays/s). Set NERF_EMITTER_MEGA_PIPELINED=0 to fall back to the
    two-kernel path. Math per tile is identical either way.

    mxu_chunk > 1 splits each hidden-layer matmul of the pipelined kernel
    into that many column slices (measured slower on v5e; kept for
    experiments). Both knobs — and their env-var defaults
    (NERF_EMITTER_MEGA_PIPELINED / NERF_EMITTER_MEGA_MXU_CHUNK) — are
    BUILD-TIME only: they are baked into the traced kernel here, and
    changing the env after a query is built has no effect on it."""
    assert model.implementation == "freq", "mega path is freq-only"
    from .fused_field import make_fused_radiance_query

    if pipelined is None:
        pipelined = os.environ.get("NERF_EMITTER_MEGA_PIPELINED", "1") == "1"
    if mxu_chunk is None:
        raw = os.environ.get("NERF_EMITTER_MEGA_MXU_CHUNK", "1")
        try:
            mxu_chunk = int(raw)
        except ValueError as e:
            raise ValueError(
                f"NERF_EMITTER_MEGA_MXU_CHUNK={raw!r} must be an integer "
                "(number of column slices per hidden-layer matmul)"
            ) from e
    if mxu_chunk < 1:
        raise ValueError(f"mxu_chunk must be >= 1, got {mxu_chunk}")

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

        if pipelined:
            n_tiles = np_ // TILE_RAYS
            kern = functools.partial(
                _mega_pipeline_kernel,
                n_w0=len(ws0), n_w1=len(ws1), n_base=len(bws),
                n_head=len(hws), n_emb=n_emb, s0=s0, s1=s1, s2=s2,
                freqs0=prop_freqs[0], freqs1=prop_freqs[1],
                freqs_f=field_freqs, aabb_lo=aabb_lo,
                aabb_inv_ext=aabb_inv_ext, disable_box=dbox,
                avg_density=1.0, hdr=model.hdr, rgb_bias=model.rgb_bias,
                mxu_chunk=mxu_chunk,
            )
            ray_tile = lambda rows: pl.BlockSpec(
                (rows, TILE_RAYS),
                lambda i: (0, jnp.minimum(i, n_tiles - 1)),
                memory_space=pltpu.VMEM,
            )
            rgb_t = pl.pallas_call(
                kern,
                grid=(n_tiles + 1,),
                in_specs=[
                    ray_tile(3), ray_tile(3), ray_tile(1), ray_tile(1),
                    full(emb2.shape),
                    *[full(w.shape) for w in ws0], *[full(b.shape) for b in bs0],
                    *[full(w.shape) for w in ws1], *[full(b.shape) for b in bs1],
                    *[full(w.shape) for w in bws], *[full(b.shape) for b in bbs],
                    *[full(w.shape) for w in hws], *[full(b.shape) for b in hbs],
                ],
                out_specs=pl.BlockSpec(
                    (3, TILE_RAYS),
                    lambda i: (0, jnp.maximum(i, 1) - 1),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((3, np_), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((8 + s2 + 1, TILE_RAYS), jnp.float32)
                ],
                interpret=_interpret(),
            )(
                o_t, d_t, near_t, far_t, emb2,
                *ws0, *bs0, *ws1, *bs1, *bws, *bbs, *hws, *hbs,
            )
            return rgb_t[:, :n].T

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
