"""Breakdown of megakernel A (proposals): density MLPs vs resampling.

Variants (same I/O shapes, pieces stubbed):
  dens-only : both density passes + scans, resamples replaced by uniform
  resample-only : densities replaced by a constant, resamples kept
  full : the production kernel
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

from nerf_emitter_tpu.cameras.rays import RayBundle
from nerf_emitter_tpu.models.nerfacto import NerfactoModel
from nerf_emitter_tpu.ops import mega_query as mq
from nerf_emitter_tpu.ops.fused_field import (
    _freqs_of,
    _mlp_params,
    fmajor_permutation,
)

NUM_RAYS = 2**16
N_ITERS = 8


def timed(fn, *args):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / N_ITERS * 1e3


def make_variant_kernel(mode, *, n_w0, n_w1, s0, s1, s2, freqs0, freqs1,
                        aabb_lo, aabb_inv_ext):
    def kernel(o_ref, d_ref, near_ref, far_ref, *refs):
        w0 = [r[:] for r in refs[:n_w0]]
        b0 = [r[:] for r in refs[n_w0 : 2 * n_w0]]
        w1 = [r[:] for r in refs[2 * n_w0 : 2 * n_w0 + n_w1]]
        b1 = [r[:] for r in refs[2 * n_w0 + n_w1 : 2 * n_w0 + 2 * n_w1]]
        out_ref = refs[2 * n_w0 + 2 * n_w1]

        o = o_ref[:]
        d = d_ref[:]
        r = o.shape[1]
        s_near = mq._spacing_pw(near_ref[:])
        s_far = mq._spacing_pw(far_ref[:])
        dens_kw = dict(aabb_lo=aabb_lo, aabb_inv_ext=aabb_inv_ext,
                       disable_box=None, avg_density=1.0, subtile=8192)

        sbins0 = mq._row_iota(s0 + 1, r) / float(s0)
        ebins0 = mq._spacing_pw_inv(sbins0 * (s_far - s_near) + s_near)
        if mode in ("dens-only", "full"):
            dens0 = mq._density_rows(ebins0, o, d, w0, b0, num_freqs=freqs0,
                                     **dens_kw)
        else:
            dens0 = ebins0[1:] * 0.3  # fake, same shape
        wts0 = mq._weights_rows(dens0, ebins0[1:] - ebins0[:-1])
        if mode in ("resample-only", "full"):
            sbins1 = mq._resample_rows(wts0, sbins0, s1)
        else:
            sbins1 = mq._row_iota(s1 + 1, r) / float(s1) + 0.0 * wts0[:1]

        ebins1 = mq._spacing_pw_inv(sbins1 * (s_far - s_near) + s_near)
        if mode in ("dens-only", "full"):
            dens1 = mq._density_rows(ebins1, o, d, w1, b1, num_freqs=freqs1,
                                     **dens_kw)
        else:
            dens1 = ebins1[1:] * 0.3
        wts1 = mq._weights_rows(dens1, ebins1[1:] - ebins1[:-1])
        if mode in ("resample-only", "full"):
            out_ref[:, :] = mq._resample_rows(wts1, sbins1, s2)
        else:
            out_ref[:, :] = mq._row_iota(s2 + 1, r) / float(s2) + 0.0 * wts1[:1]

    return kernel


def main():
    model = NerfactoModel(
        aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
        num_nerf_samples=48, num_proposal_samples=(256, 96),
        log2_hashmap_size=19, max_res=2048, num_cameras=128,
        implementation="freq",
    )
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (NUM_RAYS, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBundle(
        origins=jnp.zeros((NUM_RAYS, 3)), directions=d,
        pixel_area=jnp.full((NUM_RAYS, 1), 1e-4),
        nears=jnp.full((NUM_RAYS, 1), 0.05),
        fars=jnp.full((NUM_RAYS, 1), 6.0),
        camera_indices=jnp.zeros((NUM_RAYS, 1), jnp.int32),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), rays)
    p = params["params"]
    s0, s1 = model.num_proposal_samples
    s2 = model.num_nerf_samples
    aabb = np.asarray(model.aabb, np.float32)
    aabb_lo = tuple(float(x) for x in aabb[0])
    aabb_inv_ext = tuple(1.0 / float(hi - lo) for lo, hi in zip(aabb[0], aabb[1]))

    ws0, bs0 = _mlp_params(p["proposal_0"]["mlp"])
    ws1, bs1 = _mlp_params(p["proposal_1"]["mlp"])
    prop_freqs = [_freqs_of(ws0[0]), _freqs_of(ws1[0])]

    def perm_first(ws, freqs):
        perm = jnp.asarray(fmajor_permutation(freqs), jnp.int32)
        return (ws[0][perm],) + tuple(ws[1:])

    ws0 = perm_first(ws0, prop_freqs[0])
    ws1 = perm_first(ws1, prop_freqs[1])

    o_t, d_t = rays.origins.T, rays.directions.T
    near_t, far_t = rays.nears.T, rays.fars.T

    T = mq.TILE_RAYS
    full = lambda shape: pl.BlockSpec(
        shape, functools.partial(lambda i, _r: (0,) * _r, _r=len(shape)),
        memory_space=pltpu.VMEM,
    )
    tile = lambda rows: pl.BlockSpec(
        (rows, T), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    for mode in ("full", "dens-only", "resample-only"):
        kern = make_variant_kernel(
            mode, n_w0=len(ws0), n_w1=len(ws1), s0=s0, s1=s1, s2=s2,
            freqs0=prop_freqs[0], freqs1=prop_freqs[1],
            aabb_lo=aabb_lo, aabb_inv_ext=aabb_inv_ext,
        )

        @jax.jit
        def run(o_t, d_t, near_t, far_t, ws0, bs0, ws1, bs1, kern=kern):
            return jnp.sum(pl.pallas_call(
                kern,
                grid=(NUM_RAYS // T,),
                in_specs=[
                    tile(3), tile(3), tile(1), tile(1),
                    *[full(w.shape) for w in ws0], *[full(b.shape) for b in bs0],
                    *[full(w.shape) for w in ws1], *[full(b.shape) for b in bs1],
                ],
                out_specs=tile(s2 + 1),
                out_shape=jax.ShapeDtypeStruct((s2 + 1, NUM_RAYS), jnp.float32),
            )(o_t, d_t, near_t, far_t, *ws0, *bs0, *ws1, *bs1))

        t = timed(run, o_t, d_t, near_t, far_t, ws0, bs0, ws1, bs1)
        print(f"{mode:14s}: {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
