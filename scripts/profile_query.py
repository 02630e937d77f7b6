"""Per-kernel timing of the megafused emitter query on the real chip.

Times, at the bench configuration (2^16 rays, 256/96 proposals + 48 nerf
samples): kernel A alone, kernel B alone (random bins), the full mega
query, the staged query, and the host-visible overhead (pad/transpose +
launch) = full - (A + B). Run on TPU:

    python scripts/profile_query.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_emitter_tpu.cameras.rays import RayBundle
from nerf_emitter_tpu.models.nerfacto import NerfactoModel

NUM_RAYS = 2**16
N_ITERS = 8


def timed(fn, *args):
    np.asarray(jax.tree.leaves(fn(*args))[0])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / N_ITERS * 1e3  # ms


def main():
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nerf_emitter_tpu.ops import mega_query as mq
    from nerf_emitter_tpu.ops.fused_field import (
        _mlp_params,
        _freqs_of,
        fmajor_permutation,
        make_fused_radiance_query,
    )

    model = NerfactoModel(
        aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
        num_nerf_samples=48,
        num_proposal_samples=(256, 96),
        log2_hashmap_size=19,
        max_res=2048,
        num_cameras=128,
        implementation="freq",
    )
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (NUM_RAYS, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBundle(
        origins=jnp.zeros((NUM_RAYS, 3)),
        directions=d,
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

    o_t = rays.origins.T
    d_t = rays.directions.T
    near_t = rays.nears.T
    far_t = rays.fars.T

    T = mq.TILE_RAYS
    full = lambda shape: pl.BlockSpec(
        shape, functools.partial(lambda i, _r: (0,) * _r, _r=len(shape)),
        memory_space=pltpu.VMEM,
    )
    tile = lambda rows: pl.BlockSpec(
        (rows, T), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    kern_a = functools.partial(
        mq._proposal_kernel,
        n_w0=len(ws0), n_w1=len(ws1), s0=s0, s1=s1, s2=s2,
        freqs0=prop_freqs[0], freqs1=prop_freqs[1],
        aabb_lo=aabb_lo, aabb_inv_ext=aabb_inv_ext, disable_box=None,
        avg_density=1.0,
    )

    @jax.jit
    def run_a(o_t, d_t, near_t, far_t, ws0, bs0, ws1, bs1):
        return jnp.sum(pl.pallas_call(
            kern_a,
            grid=(NUM_RAYS // T,),
            in_specs=[
                tile(3), tile(3), tile(1), tile(1),
                *[full(w.shape) for w in ws0], *[full(b.shape) for b in bs0],
                *[full(w.shape) for w in ws1], *[full(b.shape) for b in bs1],
            ],
            out_specs=tile(s2 + 1),
            out_shape=jax.ShapeDtypeStruct((s2 + 1, NUM_RAYS), jnp.float32),
        )(o_t, d_t, near_t, far_t, *ws0, *bs0, *ws1, *bs1))

    f = p["field"]
    bws, bbs = _mlp_params(f["base_mlp"])
    field_freqs = _freqs_of(bws[0])
    bws = perm_first(bws, field_freqs)
    hws, hbs = _mlp_params(f["head_mlp"])
    emb = f["appearance_embedding"]["embedding"][0]
    n_emb = emb.shape[0]
    emb2 = emb[None, :]

    kern_b = functools.partial(
        mq._field_composite_kernel,
        n_base=len(bws), n_head=len(hws), n_emb=n_emb, s2=s2,
        freqs=field_freqs,
        aabb_lo=aabb_lo, aabb_inv_ext=aabb_inv_ext, disable_box=None,
        avg_density=1.0, hdr=model.hdr, rgb_bias=model.rgb_bias,
    )

    # plausible bins: sorted uniforms in [0, 1)
    sb = jnp.sort(
        jax.random.uniform(jax.random.PRNGKey(7), (s2 + 1, NUM_RAYS)), axis=0
    )

    @jax.jit
    def run_b(sb, o_t, d_t, near_t, far_t, emb2, bws, bbs, hws, hbs):
        return jnp.sum(pl.pallas_call(
            kern_b,
            grid=(NUM_RAYS // T,),
            in_specs=[
                tile(s2 + 1), tile(3), tile(3), tile(1), tile(1),
                full(emb2.shape),
                *[full(w.shape) for w in bws], *[full(b.shape) for b in bbs],
                *[full(w.shape) for w in hws], *[full(b.shape) for b in hbs],
            ],
            out_specs=tile(3),
            out_shape=jax.ShapeDtypeStruct((3, NUM_RAYS), jnp.float32),
        )(sb, o_t, d_t, near_t, far_t, emb2, *bws, *bbs, *hws, *hbs))

    t_a = timed(run_a, o_t, d_t, near_t, far_t, ws0, bs0, ws1, bs1)
    t_b = timed(run_b, sb, o_t, d_t, near_t, far_t, emb2, bws, bbs, hws, hbs)

    from nerf_emitter_tpu.ops.mega_query import make_mega_radiance_query

    fused = make_mega_radiance_query(model, pipelined=False)
    mega = jax.jit(lambda pr, rb: jnp.sum(fused(pr, rb)))
    t_full = timed(mega, params, rays)

    fused_p = make_mega_radiance_query(model, pipelined=True)
    mega_p = jax.jit(lambda pr, rb: jnp.sum(fused_p(pr, rb)))
    t_pipe = timed(mega_p, params, rays)

    # pipelined with column-chunked B matmuls (finer MXU/VPU interleave)
    t_chunk = {}
    for nc in (2, 3, 4):
        os.environ["NERF_EMITTER_MEGA_MXU_CHUNK"] = str(nc)
        fused_c = make_mega_radiance_query(model, pipelined=True)
        mega_c = jax.jit(lambda pr, rb, f=fused_c: jnp.sum(f(pr, rb)))
        t_chunk[nc] = timed(mega_c, params, rays)
    os.environ.pop("NERF_EMITTER_MEGA_MXU_CHUNK", None)

    staged = make_fused_radiance_query(model)
    staged_j = jax.jit(lambda pr, rb: jnp.sum(staged(pr, rb)))
    t_staged = timed(staged_j, params, rays)

    print(f"kernel A (proposals):      {t_a:8.2f} ms")
    print(f"kernel B (field+composite):{t_b:8.2f} ms")
    print(f"mega query (two kernels):  {t_full:8.2f} ms")
    print(f"  overhead (full - A - B): {t_full - t_a - t_b:8.2f} ms")
    print(f"mega query (pipelined):    {t_pipe:8.2f} ms")
    for nc, t in t_chunk.items():
        print(f"mega query (pipe chunk={nc}):{t:8.2f} ms")
    print(f"staged query:              {t_staged:8.2f} ms")
    print(f"rays/s (mega 2-kernel):    {NUM_RAYS / t_full * 1e3:,.0f}")
    print(f"rays/s (mega pipelined):   {NUM_RAYS / t_pipe * 1e3:,.0f}")


if __name__ == "__main__":
    main()
