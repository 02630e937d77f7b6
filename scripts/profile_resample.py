"""Standalone timing of inverse-CDF resample variants inside a Pallas
kernel (the measured hot spot of megakernel A).

Variants: telescoped relu at chunk 32/64/full, and a scalar-u form where
the (static) u grid enters as Python scalars over unrolled output rows.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_emitter_tpu.ops import mega_query as mq

NUM_RAYS = 2**16
N_ITERS = 8
TILE = mq.TILE_RAYS
S0, S1, S2 = 256, 96, 48
_EPS = mq._EPS
_HIST_PAD = mq._HIST_PAD


def timed(fn, *args):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / N_ITERS * 1e3


def _prep(weights, sbins):
    s_in, r = weights.shape
    w = weights + _HIST_PAD
    w_sum = jnp.sum(w, axis=0, keepdims=True)
    padding = jnp.maximum(_EPS - w_sum, 0.0)
    w = w + padding / s_in
    w_sum = w_sum + padding
    pdf = w / w_sum
    incl = mq._cumsum_rows(pdf)
    cdf = jnp.concatenate(
        [jnp.zeros((1, r), jnp.float32), jnp.minimum(1.0, incl[:-1]),
         jnp.ones((1, r), jnp.float32)], axis=0,
    )
    d_bins = sbins[1:] - sbins[:-1]
    d_cdf = cdf[1:] - cdf[:-1]
    g = d_bins / jnp.maximum(d_cdf, _EPS)
    zero = jnp.zeros((1, r), jnp.float32)
    coef = jnp.concatenate([g, zero], 0) - jnp.concatenate([zero, g], 0)
    return cdf, coef


def resample_chunk(weights, sbins, n_out, chunk):
    s_in, r = weights.shape
    cdf, coef = _prep(weights, sbins)
    step = (1.0 - _EPS) / n_out
    u = mq._row_iota(n_out + 1, r) * step + 1.0 / (2.0 * (n_out + 1))
    new_bins = jnp.broadcast_to(sbins[:1], (n_out + 1, r)) * 1.0
    u3 = u.reshape(n_out + 1, 1, r)
    for c0 in range(0, s_in + 1, chunk):
        c_cdf = cdf[c0 : c0 + chunk].reshape(1, -1, r)
        c_coef = coef[c0 : c0 + chunk].reshape(1, -1, r)
        new_bins = new_bins + jnp.sum(
            c_coef * jnp.maximum(u3 - c_cdf, 0.0), axis=1
        )
    return new_bins


def resample_scalar_u(weights, sbins, n_out):
    """u enters as PYTHON scalars: per output row one (S+1, R) 2D pass
    (sub scalar, relu, mul, reduce-rows) — no 3D broadcasts anywhere."""
    s_in, r = weights.shape
    cdf, coef = _prep(weights, sbins)
    step = (1.0 - _EPS) / n_out
    rows = []
    for i in range(n_out + 1):
        u_i = float(i) * step + 1.0 / (2.0 * (n_out + 1))
        contrib = jnp.sum(coef * jnp.maximum(u_i - cdf, 0.0), axis=0)
        rows.append(contrib)
    return sbins[:1] + jnp.stack(rows, axis=0)


def resample_scalar_u_bf16(weights, sbins, n_out):
    """scalar-u with the per-cell ramp math in bf16 (coef/cdf quantized
    once); accumulation stays in the bf16 sum — tests whether the VPU
    runs packed bf16 elementwise at 2x f32."""
    s_in, r = weights.shape
    cdf, coef = _prep(weights, sbins)
    cdf16 = cdf.astype(jnp.bfloat16)
    coef16 = coef.astype(jnp.bfloat16)
    step = (1.0 - _EPS) / n_out
    rows = []
    for i in range(n_out + 1):
        u_i = float(i) * step + 1.0 / (2.0 * (n_out + 1))
        contrib = jnp.sum(
            coef16 * jnp.maximum(jnp.bfloat16(u_i) - cdf16, jnp.bfloat16(0)),
            axis=0,
        )
        rows.append(contrib.astype(jnp.float32))
    return sbins[:1] + jnp.stack(rows, axis=0)


def resample_scalar_u_mxu(weights, sbins, n_out):
    """scalar-u with the segment reduce on the MXU: per output row the VPU
    does sub+max+mul (3 ops/cell) and a ones-vector dot_general contracts
    the sublane axis — frees one VPU pass per cell if the tiny matmuls
    pipeline well."""
    s_in, r = weights.shape
    cdf, coef = _prep(weights, sbins)
    ones = jnp.ones((s_in + 1, 1), jnp.float32)
    step = (1.0 - _EPS) / n_out
    rows = []
    for i in range(n_out + 1):
        u_i = float(i) * step + 1.0 / (2.0 * (n_out + 1))
        elem = coef * jnp.maximum(u_i - cdf, 0.0)  # (S+1, R)
        val = jax.lax.dot_general(
            ones, elem, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, R)
        rows.append(val[0])
    return sbins[:1] + jnp.stack(rows, axis=0)


def make_kernel(fn):
    def kernel(w0_ref, sb0_ref, w1_ref, sb1_ref, out_ref):
        sb1 = fn(w0_ref[:], sb0_ref[:], S1)
        out_ref[:, :] = fn(w1_ref[:], sb1, S2)

    return kernel


def main():
    key = jax.random.PRNGKey(0)
    w0 = jax.random.uniform(key, (S0, NUM_RAYS)) * 0.01
    sb0 = jnp.broadcast_to(
        jnp.linspace(0.0, 1.0, S0 + 1)[:, None], (S0 + 1, NUM_RAYS)
    ) * 1.0
    w1 = jax.random.uniform(jax.random.PRNGKey(1), (S1, NUM_RAYS)) * 0.01
    sb1 = jnp.broadcast_to(
        jnp.linspace(0.0, 1.0, S1 + 1)[:, None], (S1 + 1, NUM_RAYS)
    ) * 1.0

    tile = lambda rows: pl.BlockSpec(
        (rows, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    variants = {
        "scalar-u": resample_scalar_u,
        "scalar-u-mxu": resample_scalar_u_mxu,
    }
    ref_out = None
    for name, fn in variants.items():
        kern = make_kernel(fn)

        @jax.jit
        def run(w0, sb0, w1, sb1, kern=kern):
            return pl.pallas_call(
                kern,
                grid=(NUM_RAYS // TILE,),
                in_specs=[tile(S0), tile(S0 + 1), tile(S1), tile(S1 + 1)],
                out_specs=tile(S2 + 1),
                out_shape=jax.ShapeDtypeStruct((S2 + 1, NUM_RAYS), jnp.float32),
            )(w0, sb0, w1, sb1)

        out = run(w0, sb0, w1, sb1)
        got = np.asarray(out[:, :256])
        if ref_out is None:
            ref_out = got
        else:
            err = np.max(np.abs(got - ref_out))
            print(f"  max |diff| vs scalar-u: {err:.2e}")
        t = timed(lambda a, b, c, d, r=run: jnp.sum(r(a, b, c, d)),
                  w0, sb0, w1, sb1)
        print(f"{name:12s}: {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
