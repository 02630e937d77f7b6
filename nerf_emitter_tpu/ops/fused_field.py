"""Fused Pallas kernels for the frequency-encoded radiance field.

The emitter query (SURVEY.md §3.2 hot loop #3) is bandwidth-bound in XLA:
each MLP stage materializes (n_samples, width) activations in HBM (2+ GB
per proposal level at 2^16 rays — measured 3.5 GB of HLO temps), so the
profile is ~80% field evals at ~3-20x above the MXU roofline. These
kernels keep the ENTIRE per-sample pipeline — affine contraction,
selector, frequency encoding, all MLP layers, activation, carve-out — in
VMEM, reading only raw positions/directions (transposed (3, M): the
sample axis on TPU lanes, see cameras/rays.py layout note) and writing
only the final density/rgb rows.

This is the TPU answer to tiny-cuda-nn's fully-fused MLP (the reference's
fast path, nerfstudio/field_components/mlp.py:106-140): where tcnn fuses
hash-lookup+MLP into one CUDA kernel, we fuse freq-encode+MLP into one
Pallas kernel feeding the MXU.

Gradients: wrapped in jax.custom_vjp whose backward recomputes through the
plain-jnp reference implementation (exact same math graph), so the fused
forward is used everywhere while training/adjoint passes keep exact AD.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SAFE_EXP_MAX = 88.0

def _interpret() -> bool:
    # pallas TPU kernels run in interpreter mode off-TPU (CPU unit tests)
    import jax as _jax

    return _jax.default_backend() != "tpu"


# samples per grid step. Large tiles amortize the per-step weight DMA (the
# field kernel's weights are ~1.3 MB; at TILE=1024 they would be re-fetched
# 3000x per 2^16-ray query). VMEM budget: field needs (TILE,256) f32
# activations + weights + enc rows.
TILE_DENSITY = 8192
TILE_FIELD = 4096


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _eye(n: int, dtype) -> jax.Array:
    """Identity built from iota — jnp.eye is an array literal, which Pallas
    kernels may not capture."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(dtype)


# ---------------------------------------------------------------------------
# in-kernel building blocks (operate on (K, T) row-major feature blocks)
# ---------------------------------------------------------------------------


def _freq_rows(x2: jax.Array, num_freqs: int) -> jax.Array:
    """x2: (3, T) in [-1,1] -> encoding rows (3 + 6F, T), matching
    encodings.nerf_encode ordering ([x, sin(d-major,f-minor), cos]).

    Octaves come from the double-angle recurrence sin(2a)=2 sin a cos a,
    cos(2a)=1-2 sin^2 a off ONE base sin/cos per dim: direct per-octave
    sin/cos was 90% of the density-kernel wall time (VPU transcendentals
    with range reduction up to 2^{F-1} * 2pi rad); the recurrence is 3
    mul-adds per octave. Accumulated roundoff (~3e-3 rel at F=10) sits
    below the bf16 quantization the MLP applies to these rows anyway.
    Used by BOTH the Pallas kernels and the plain-jnp VJP references, so
    forward/backward stay on the same math graph."""
    theta = x2 * (2.0 * jnp.pi)
    s, c = jnp.sin(theta), jnp.cos(theta)  # (3, T) each
    ss, cs = [s], [c]
    for _ in range(num_freqs - 1):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        ss.append(s)
        cs.append(c)
    sin_rows = [ss[i][k] for k in range(3) for i in range(num_freqs)]
    cos_rows = [cs[i][k] for k in range(3) for i in range(num_freqs)]
    return jnp.concatenate(
        [x2, jnp.stack(sin_rows, axis=0), jnp.stack(cos_rows, axis=0)], axis=0
    )


def _freq_rows_fmajor(x2: jax.Array, num_freqs: int) -> jax.Array:
    """Like _freq_rows but rows ordered [x, sin f-major (dim-minor), cos
    f-major]: whole (3, T) octave blocks concatenate directly with no
    per-row stack (each stack row is a sublane relayout; measured ~8% of
    the density kernel). Callers must permute first-layer weight ROWS with
    `fmajor_permutation(num_freqs)` to keep the same function."""
    theta = x2 * (2.0 * jnp.pi)
    s, c = jnp.sin(theta), jnp.cos(theta)
    ss, cs = [s], [c]
    for _ in range(num_freqs - 1):
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        ss.append(s)
        cs.append(c)
    return jnp.concatenate([x2] + ss + cs, axis=0)


def fmajor_permutation(num_freqs: int):
    """Row permutation p with enc_fmajor[j] == enc_kmajor[p[j]]: apply as
    W_fmajor = W_kmajor[p] on the first-layer weights (host side)."""
    f = num_freqs
    perm = list(range(3))
    perm += [3 + k * f + i for i in range(f) for k in range(3)]  # sin block
    perm += [3 + 3 * f + k * f + i for i in range(f) for k in range(3)]
    return perm


def _mlp_rowsT(enc: jax.Array, ws: Sequence[jax.Array], bs: Sequence[jax.Array]):
    """enc: (E, T) feature rows -> (out_dim, T) feature rows.

    The whole MLP stays in (features, T) orientation: every layer is
    dot_general(W (in,out) contracting dim0, h (in,T) contracting dim0) ->
    (out, T). T never leaves the lane axis, weights are the stationary MXU
    operand, and no transposes are ever materialized. bf16 operands with
    f32 accumulation (fields/mlp.py compute_dtype semantics)."""

    def layer(w, b, h):
        out = jax.lax.dot_general(
            w.astype(jnp.bfloat16),
            h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out + b.astype(jnp.float32)[:, None]

    h = enc.astype(jnp.bfloat16)
    for w, b in zip(ws[:-1], bs[:-1]):
        h = jnp.maximum(layer(w, b, h).astype(jnp.bfloat16), 0)
    w, b = ws[-1], bs[-1]
    if w.shape[1] <= 4:
        # tiny output head: an (K -> <=4, T) contraction on the MXU pads the
        # output dim to 128 (up to 128x wasted cycles); a VPU reduce is free
        # by comparison
        rows = [
            jnp.sum(w[:, o].astype(jnp.float32)[:, None] * h.astype(jnp.float32), axis=0)
            + b[o].astype(jnp.float32)
            for o in range(w.shape[1])
        ]
        return jnp.stack(rows, axis=0)
    return layer(w, b, h)


def _contract_and_select(pos, aabb_lo, aabb_inv_ext, disable_box):
    """pos (3,T) world -> (x2 (3,T) in [-1,1], keep-mask (T,)).

    Per-axis arithmetic with PYTHON scalars (compile-time constants) —
    Pallas kernels may not capture array constants."""
    units = [(pos[k] - float(aabb_lo[k])) * float(aabb_inv_ext[k]) for k in range(3)]
    sel = (
        (units[0] >= 0.0) & (units[0] <= 1.0)
        & (units[1] >= 0.0) & (units[1] <= 1.0)
        & (units[2] >= 0.0) & (units[2] <= 1.0)
    )
    keep = sel
    if disable_box is not None:
        lo, hi = disable_box
        inside = (
            (pos[0] > float(lo[0])) & (pos[0] < float(hi[0]))
            & (pos[1] > float(lo[1])) & (pos[1] < float(hi[1]))
            & (pos[2] > float(lo[2])) & (pos[2] < float(hi[2]))
        )
        keep = sel & jnp.logical_not(inside)
    x2 = jnp.stack(units, axis=0) * 2.0 - 1.0
    return x2, keep


# ---------------------------------------------------------------------------
# fused proposal density: contraction + freq encode + MLP + safe_exp
# ---------------------------------------------------------------------------


def _density_kernel(
    pos_ref, *refs, num_freqs, n_w, aabb_lo, aabb_inv_ext, disable_box, avg_density
):
    w_refs = refs[:n_w]
    b_refs = refs[n_w : 2 * n_w]
    out_ref = refs[2 * n_w]
    pos = pos_ref[:]  # (3, T)
    x2, keep = _contract_and_select(pos, aabb_lo, aabb_inv_ext, disable_box)
    enc = _freq_rows(x2, num_freqs)
    raw = _mlp_rowsT(enc, [w[:] for w in w_refs], [b[:] for b in b_refs])  # (1, T)
    d = avg_density * jnp.exp(jnp.minimum(raw[0] - 1.0, SAFE_EXP_MAX))
    out_ref[0, :] = jnp.where(keep, d, 0.0)


def _plain_density(pos_t, ws, bs, *, num_freqs, aabb_lo, aabb_inv_ext, disable_box, avg_density):
    """jnp reference of the fused kernel (same math; used for the VJP)."""
    x2, keep = _contract_and_select(pos_t, aabb_lo, aabb_inv_ext, disable_box)
    enc = _freq_rows(x2, num_freqs)
    h = enc.T.astype(jnp.bfloat16)
    for w, b in zip(ws[:-1], bs[:-1]):
        h = (jnp.dot(h, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + b)
        h = jnp.maximum(h.astype(jnp.bfloat16), 0)
    raw = jnp.dot(h, ws[-1].astype(jnp.bfloat16), preferred_element_type=jnp.float32) + bs[-1]
    d = avg_density * jnp.exp(jnp.minimum(raw[:, 0] - 1.0, SAFE_EXP_MAX))
    return jnp.where(keep, d, 0.0)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def fused_density(pos_t, ws, bs, num_freqs, aabb_lo, aabb_inv_ext, disable_box, avg_density):
    """pos_t: (3, M) world positions -> density (M,).

    Static config: num_freqs, aabb_lo/inv_ext (3-tuples), disable_box
    (((3,),(3,)) or None), avg_density.
    """
    m = pos_t.shape[1]
    mp = _round_up(m, TILE_DENSITY)
    if mp != m:
        pos_t = jnp.pad(pos_t, ((0, 0), (0, mp - m)))
    n_w = len(ws)
    kernel = functools.partial(
        _density_kernel,
        num_freqs=num_freqs,
        n_w=n_w,
        aabb_lo=aabb_lo,
        aabb_inv_ext=aabb_inv_ext,
        disable_box=disable_box,
        avg_density=avg_density,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, _r=len(shape): (0,) * _r, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(mp // TILE_DENSITY,),
        in_specs=[
            pl.BlockSpec((3, TILE_DENSITY), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[full(w.shape) for w in ws],
            *[full(b.shape) for b in bs],
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_DENSITY), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, mp), jnp.float32),
        interpret=_interpret(),
    )(pos_t, *ws, *bs)
    return out[0, :m]


def _fused_density_fwd(pos_t, ws, bs, num_freqs, aabb_lo, aabb_inv_ext, disable_box, avg_density):
    out = fused_density(pos_t, ws, bs, num_freqs, aabb_lo, aabb_inv_ext, disable_box, avg_density)
    return out, (pos_t, ws, bs)


def _fused_density_bwd(num_freqs, aabb_lo, aabb_inv_ext, disable_box, avg_density, res, g):
    pos_t, ws, bs = res
    _, vjp = jax.vjp(
        lambda p, w, b: _plain_density(
            p, w, b,
            num_freqs=num_freqs, aabb_lo=aabb_lo, aabb_inv_ext=aabb_inv_ext,
            disable_box=disable_box, avg_density=avg_density,
        ),
        pos_t, ws, bs,
    )
    return vjp(g)


fused_density.defvjp(_fused_density_fwd, _fused_density_bwd)


# ---------------------------------------------------------------------------
# fused radiance field: base MLP (density+geo) + SH + appearance + rgb head
# ---------------------------------------------------------------------------


def _sh4_rows(d: jax.Array) -> jax.Array:
    """Degree-4 real SH basis as rows: d (3, T) unit dirs -> (16, T).
    Same coefficients/order as encodings.sh_encode."""
    x, y, z = d[0], d[1], d[2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    comps = [
        jnp.full_like(x, 0.28209479177387814),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ]
    return jnp.stack(comps, axis=0)


def _field_kernel(
    pos_ref, dir_ref, emb_ref, *refs,
    num_freqs, n_base, n_head, aabb_lo, aabb_inv_ext, disable_box,
    avg_density, geo_dim, hdr, rgb_bias,
):
    bw = refs[:n_base]
    bb = refs[n_base : 2 * n_base]
    hw = refs[2 * n_base : 2 * n_base + n_head]
    hb = refs[2 * n_base + n_head : 2 * n_base + 2 * n_head]
    dens_ref = refs[2 * n_base + 2 * n_head]
    rgb_ref = refs[2 * n_base + 2 * n_head + 1]

    pos = pos_ref[:]  # (3, T)
    dirs = dir_ref[:]  # (3, T)
    x2, keep = _contract_and_select(pos, aabb_lo, aabb_inv_ext, disable_box)
    enc = _freq_rows(x2, num_freqs)
    base = _mlp_rowsT(enc, [w[:] for w in bw], [b[:] for b in bb])  # (1+geo, T)
    d = avg_density * jnp.exp(jnp.minimum(base[0] - 1.0, SAFE_EXP_MAX))
    dens_ref[0, :] = jnp.where(keep, d, 0.0)

    # rgb head: [sh(16), geo(geo_dim), emb(E)] rows -> head MLP -> safe_exp;
    # everything stays (features, T) so no transposes exist anywhere
    t = pos.shape[-1]
    sh = _sh4_rows(dirs)  # (16, T)
    geo_rows = base[1:, :]  # (geo, T)
    emb = emb_ref[0, :]  # (E,)
    emb_rows = jnp.broadcast_to(emb[:, None], (emb.shape[0], t))
    h_in = jnp.concatenate([sh, geo_rows, emb_rows], axis=0)  # (16+geo+E, T)
    raw = _mlp_rowsT(h_in, [w[:] for w in hw], [b[:] for b in hb])  # (3, T)
    if hdr:
        rgb = jnp.exp(jnp.minimum(raw + rgb_bias, SAFE_EXP_MAX))
    else:
        rgb = jax.nn.sigmoid(raw)
    rgb_ref[:, :] = rgb


def _plain_field(pos_t, dirs_t, emb, bws, bbs, hws, hbs, *, num_freqs, aabb_lo,
                 aabb_inv_ext, disable_box, avg_density, geo_dim, hdr, rgb_bias):
    x2, keep = _contract_and_select(pos_t, aabb_lo, aabb_inv_ext, disable_box)
    enc = _freq_rows(x2, num_freqs)

    def mlp(x, ws, bs):
        h = x.astype(jnp.bfloat16)
        for w, b in zip(ws[:-1], bs[:-1]):
            h = jnp.dot(h, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32) + b
            h = jnp.maximum(h.astype(jnp.bfloat16), 0)
        return jnp.dot(h, ws[-1].astype(jnp.bfloat16), preferred_element_type=jnp.float32) + bs[-1]

    base = mlp(enc.T, bws, bbs)
    d = avg_density * jnp.exp(jnp.minimum(base[:, 0] - 1.0, SAFE_EXP_MAX))
    density = jnp.where(keep, d, 0.0)
    sh = _sh4_rows(dirs_t)
    emb_rows = jnp.broadcast_to(emb[:, None], (emb.shape[0], pos_t.shape[1]))
    h_in = jnp.concatenate([sh, base[:, 1:].T, emb_rows], axis=0)
    raw = mlp(h_in.T, hws, hbs)
    rgb = (
        jnp.exp(jnp.minimum(raw + rgb_bias, SAFE_EXP_MAX))
        if hdr
        else jax.nn.sigmoid(raw)
    )
    return density, rgb.T


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14))
def fused_field(pos_t, dirs_t, emb, bws, bbs, hws, hbs,
                num_freqs, aabb_lo, aabb_inv_ext, disable_box, avg_density,
                geo_dim, hdr, rgb_bias):
    """pos_t/dirs_t: (3, M); emb: (E,) appearance vector (one camera).
    Returns (density (M,), rgb_t (3, M))."""
    m = pos_t.shape[1]
    mp = _round_up(m, TILE_FIELD)
    if mp != m:
        pos_t = jnp.pad(pos_t, ((0, 0), (0, mp - m)))
        dirs_t = jnp.pad(dirs_t, ((0, 0), (0, mp - m)), constant_values=1.0)
    emb2 = emb[None, :]
    n_base, n_head = len(bws), len(hws)
    kernel = functools.partial(
        _field_kernel,
        num_freqs=num_freqs, n_base=n_base, n_head=n_head,
        aabb_lo=aabb_lo, aabb_inv_ext=aabb_inv_ext, disable_box=disable_box,
        avg_density=avg_density, geo_dim=geo_dim, hdr=hdr, rgb_bias=rgb_bias,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, _r=len(shape): (0,) * _r, memory_space=pltpu.VMEM
    )
    dens, rgb_t = pl.pallas_call(
        kernel,
        grid=(mp // TILE_FIELD,),
        in_specs=[
            pl.BlockSpec((3, TILE_FIELD), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_FIELD), lambda i: (0, i), memory_space=pltpu.VMEM),
            full(emb2.shape),
            *[full(w.shape) for w in bws],
            *[full(b.shape) for b in bbs],
            *[full(w.shape) for w in hws],
            *[full(b.shape) for b in hbs],
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_FIELD), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_FIELD), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, mp), jnp.float32),
            jax.ShapeDtypeStruct((3, mp), jnp.float32),
        ],
        interpret=_interpret(),
    )(pos_t, dirs_t, emb2, *bws, *bbs, *hws, *hbs)
    return dens[0, :m], rgb_t[:, :m]


def _fused_field_fwd(pos_t, dirs_t, emb, bws, bbs, hws, hbs, *static):
    out = fused_field(pos_t, dirs_t, emb, bws, bbs, hws, hbs, *static)
    return out, (pos_t, dirs_t, emb, bws, bbs, hws, hbs)


def _fused_field_bwd(num_freqs, aabb_lo, aabb_inv_ext, disable_box, avg_density,
                     geo_dim, hdr, rgb_bias, res, g):
    pos_t, dirs_t, emb, bws, bbs, hws, hbs = res
    _, vjp = jax.vjp(
        lambda p, d, e, a, b, c, f: _plain_field(
            p, d, e, a, b, c, f,
            num_freqs=num_freqs, aabb_lo=aabb_lo, aabb_inv_ext=aabb_inv_ext,
            disable_box=disable_box, avg_density=avg_density,
            geo_dim=geo_dim, hdr=hdr, rgb_bias=rgb_bias,
        ),
        pos_t, dirs_t, emb, bws, bbs, hws, hbs,
    )
    return vjp(g)


fused_field.defvjp(_fused_field_fwd, _fused_field_bwd)


# ---------------------------------------------------------------------------
# full fused emitter query (mirrors NerfactoModel hdr_radiance_only path)
# ---------------------------------------------------------------------------


def _mlp_params(tree):
    """Extract (weights, biases) layer tuples from an MLP param subtree.
    The layer count is derived from the tree itself (count of hidden_i
    keys) so a model built with non-default depths cannot silently read a
    subset of its layers."""
    n_hidden = sum(1 for k in tree if str(k).startswith("hidden_"))
    names = [f"hidden_{i}" for i in range(n_hidden)] + ["out"]
    ws = tuple(tree[n]["kernel"] for n in names)
    bs = tuple(tree[n]["bias"] for n in names)
    return ws, bs


def _freqs_of(w0) -> int:
    """Frequency-encoding octave count implied by a first-layer weight:
    encoding rows are (3 + 6F) (_freq_rows)."""
    rows = w0.shape[0]
    assert (rows - 3) % 6 == 0, f"first-layer input {rows} is not 3+6F"
    return (rows - 3) // 6


def make_fused_radiance_query(model, *, disable_box=None):
    """Build query(params, rays, camera_index=None) -> rgb (n, 3): the
    fused-kernel equivalent of model.apply(params, rays,
    hdr_radiance_only=True, train=False, disable_aabb=...,
    disable_aabb_on=True).

    Requires model.implementation == 'freq'. All rays share one camera
    (`camera_index`, traced scalar; None -> camera 0) — the emitter query
    serves one takeover image at a time (the reference's
    scatter_camera_idx broadcast).
    """
    assert model.implementation == "freq", "fused path is freq-only"
    from ..ops.samplers import sample_pdf, spaced_sample

    aabb = jnp.asarray(model.aabb, jnp.float32)
    aabb_lo = tuple(float(x) for x in aabb[0])
    aabb_inv_ext = tuple(1.0 / float(hi - lo) for lo, hi in zip(aabb[0], aabb[1]))
    dbox = (
        tuple(tuple(float(x) for x in row) for row in disable_box)
        if disable_box is not None
        else None
    )
    n_prop = list(model.num_proposal_samples)

    def query(params, rays, camera_index=None):
        p = params["params"]

        def positions_t(rs):
            mid = (rs.frustums.starts + rs.frustums.ends) / 2.0  # (N,S)
            # (3, N, S): sample axis minor — no padding, kernel-ready
            o = rays.origins.T[:, :, None]
            d = rays.directions.T[:, :, None]
            return (o + d * mid[None]).reshape(3, -1)

        rs = spaced_sample(rays, n_prop[0])
        weights = None
        for lvl in range(2):
            if lvl > 0:
                rs = sample_pdf(rays, rs, weights, n_prop[lvl])
            tree = p[f"proposal_{lvl}"]["mlp"]
            ws, bs = _mlp_params(tree)
            dens = fused_density(
                positions_t(rs), ws, bs,
                _freqs_of(ws[0]), aabb_lo, aabb_inv_ext, dbox, 1.0,
            ).reshape(rs.frustums.starts.shape)
            weights = rs.get_weights(dens)

        rs = sample_pdf(rays, rs, weights, model.num_nerf_samples)
        f = p["field"]
        bws, bbs = _mlp_params(f["base_mlp"])
        hws, hbs = _mlp_params(f["head_mlp"])
        field_freqs = _freqs_of(bws[0])
        geo_dim = bws[-1].shape[1] - 1  # base out = 1 (density) + geo feat
        if model.appearance_embedding_dim > 0:
            table = f["appearance_embedding"]["embedding"]
            cam = camera_index if camera_index is not None else 0
            emb = table[cam]
        else:
            emb = jnp.zeros((0,), jnp.float32)
        n, s = rs.frustums.starts.shape
        dirs_t = jnp.broadcast_to(
            rays.directions.T[:, :, None], (3, n, s)
        ).reshape(3, -1)
        dens, rgb_t = fused_field(
            positions_t(rs), dirs_t, emb, bws, bbs, hws, hbs,
            field_freqs, aabb_lo, aabb_inv_ext, dbox, 1.0,
            geo_dim, model.hdr, model.rgb_bias,
        )
        dens = dens.reshape(n, s)
        rgb_s = rgb_t.reshape(3, n, s)
        w = rs.get_weights(dens)  # (N, S)
        comp = jnp.sum(w[None] * rgb_s, axis=-1)  # (3, N)
        acc = jnp.sum(w, axis=-1)  # (N,)
        # background_color='last_sample' HDR completion
        bg = rgb_s[..., -1]
        return (comp + bg * (1.0 - acc)[None]).T  # (N, 3)

    return query
