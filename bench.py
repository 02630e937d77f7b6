"""Benchmark: emitter-query throughput (rays/sec/chip) on real hardware.

The emitter query is THE hot loop of the reference (SURVEY.md §3.2 hot loop
#3): every escaped ray of the SDF renderer is answered by a full nerfacto
radiance evaluation (proposal sampling -> field -> compositing). The
reference serves it with tiny-cuda-nn on A100-class GPUs at chunk 2^14
(method_configs.py:302-316).

Two field implementations are measured and the faster one is reported
(the framework exposes both):
- 'hash': instant-ngp hash grid — parameter-efficient, but random gathers
  have no hardware path on TPU (XLA gather ~1e8 elems/s ceiling),
- 'freq': frequency encoding + wide MLP — zero gathers, pure MXU (the
  jaxnerf/mipnerf recipe); the TPU-native flagship.

Baseline constant: the reference publishes no rays/sec figure
(BASELINE.md), so `vs_baseline` is computed against an engineering
estimate of the reference's emitter-query throughput on one A100 (tcnn
fp16 nerfacto eval at 48+352 samples/ray): ~1.5e6 rays/s. Sanity checks
(RESULTS_r03.md): 1.5M rays/s is ~6-10 TFLOP/s of fused-MLP work (2-3%
of A100 fp16 peak, so not unfairly low), the hash tables are L2-resident
(no hidden bandwidth wall), and reported nerfacto eval throughputs on
A100-class GPUs are 0.5-1.1M rays/s — the constant is at or above the
plausible range, making `vs_baseline` conservative.

Timing note: device->host transfer of the result forces a true sync (the
axon tunnel's block_until_ready can return before execution completes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

A100_EMITTER_QUERY_RAYS_PER_SEC_EST = 1.5e6
NUM_RAYS = 2**16
N_ITERS = 8


def _sample_schedule() -> tuple:
    """(proposal_0, proposal_1, nerf) sample counts. Defaults to the
    primary-view schedule the reference queries at; override with
    NERF_EMITTER_BENCH_SAMPLES="p0,p1,n" to measure a reduced
    emitter-query schedule (pipeline.emitter_samples)."""
    import os

    raw = os.environ.get("NERF_EMITTER_BENCH_SAMPLES")
    if not raw:
        return (256, 96, 48)
    p0, p1, n = (int(x) for x in raw.split(","))
    return (p0, p1, n)


def bench_distilled() -> float:
    """Throughput of the distilled light-field emitter cache
    (serving/distill.py) at the bench ray distribution. Weights are
    random-init (throughput is weight-independent); fidelity is gated
    separately by the takeover-quality A/B. Enable with
    NERF_EMITTER_BENCH_DISTILLED=1 — not the reported default until the
    quality gate flips the pipeline default."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jax import lax

    from nerf_emitter_tpu.serving.distill import (
        EmitterLightField,
        make_student_emitter_fn_of,
    )

    aabb = jnp.asarray([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]])
    module = EmitterLightField(pos_scale=0.78)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (NUM_RAYS, 3), minval=0.35, maxval=0.65)
    d = jax.random.normal(jax.random.PRNGKey(1), (NUM_RAYS, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    emb = jnp.zeros((8, 3))
    sparams = jax.jit(module.init)(key, x[:8], d[:8], emb[:, :0])
    fn = make_student_emitter_fn_of(
        module, sparams, scene_scale=1.0, object_aabb=aabb
    )({"params": {"field": {}}})

    @jax.jit
    def emitter_query(x, d):
        def body(carry, _):
            out = fn(x + carry * 1e-30, d)
            return out[0, 0], out

        _, outs = lax.scan(body, jnp.float32(0.0), None, length=N_ITERS)
        return outs[-1]

    np.asarray(emitter_query(x, d))
    t0 = time.perf_counter()
    out = emitter_query(x, d)
    np.asarray(out)
    dt = time.perf_counter() - t0
    return NUM_RAYS * N_ITERS / dt


def bench_implementation(implementation: str) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_emitter_tpu.cameras.rays import RayBundle
    from nerf_emitter_tpu.models.nerfacto import NerfactoModel

    p0, p1, n_nerf = _sample_schedule()
    model = NerfactoModel(
        aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
        num_nerf_samples=n_nerf,
        num_proposal_samples=(p0, p1),
        log2_hashmap_size=19,
        max_res=2048,
        num_cameras=128,
        implementation=implementation,
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

    if implementation == "freq":
        # megafused Pallas serving path (ops/mega_query.py): the whole
        # proposal+field pipeline in two kernels
        from nerf_emitter_tpu.ops.mega_query import make_mega_radiance_query

        fused = make_mega_radiance_query(model)
        query_once = fused
    else:

        def query_once(params, rays):
            return model.apply(params, rays, train=False, hdr_radiance_only=True)["rgb"]

    # N_ITERS queries chained ON DEVICE in one dispatch. Production calls
    # the query inside the jitted takeover step, not via per-call host
    # dispatches — and over the axon tunnel each dispatch costs a ~ms-scale
    # RPC whose jitter moved round-2 captures by ±10% (2.10M idle vs 2.57M
    # builder-measured for the identical kernel). The scalar loop carry
    # perturbs each iteration's input so XLA cannot CSE the body.
    #
    # The 'hash' fallback keeps the host-side dispatch loop: its
    # gather-heavy graph inside lax.scan crashed the axon TPU worker
    # (observed 2026-08-19), and hash is never the reported flagship.
    from jax import lax

    if implementation == "freq":

        @jax.jit
        def emitter_query(params, rays):
            def body(carry, _):
                r = rays.replace(origins=rays.origins + carry * 1e-30)
                out = query_once(params, r)
                return out[0, 0], out

            carry, outs = lax.scan(body, jnp.float32(0.0), None, length=N_ITERS)
            return outs[-1]

        # warmup / compile, with transfer-forced sync
        np.asarray(emitter_query(params, rays))

        t0 = time.perf_counter()
        out = emitter_query(params, rays)
        np.asarray(out)  # transfer = true completion barrier
        dt = time.perf_counter() - t0
        return NUM_RAYS * N_ITERS / dt

    jit_query = jax.jit(query_once)
    np.asarray(jit_query(params, rays))
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = jit_query(params, rays)
    np.asarray(out)
    dt = time.perf_counter() - t0
    return NUM_RAYS * N_ITERS / dt


def main():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from nerf_emitter_tpu.utils import capture_lock

    results = {}
    # pause the background stage queue between its dispatches so the
    # measurement sees an idle chip (round-2: queue contention depressed
    # the driver-captured number by ~8%)
    # Which serving path to report: the sdf-nerfacto DEFAULT (so the
    # headline tracks what a user actually gets), overridable either way
    # with NERF_EMITTER_BENCH_DISTILLED=1/0. The distilled default is
    # flipped by the round-4 quality gate (scripts/round4/decide_distill.py).
    from nerf_emitter_tpu.configs.methods import METHOD_CONFIGS

    distilled_default = bool(
        METHOD_CONFIGS["sdf-nerfacto"]().pipeline.distill_emitter
    )
    distilled = os.environ.get(
        "NERF_EMITTER_BENCH_DISTILLED", "1" if distilled_default else "0"
    )
    with capture_lock.capture_window("bench"):
        if distilled == "1":
            rays = bench_distilled()
            print(
                json.dumps(
                    {
                        "metric": "emitter_query_rays_per_sec_per_chip[distilled_lf]",
                        "value": round(rays, 1),
                        "unit": "rays/s",
                        "vs_baseline": round(
                            rays / A100_EMITTER_QUERY_RAYS_PER_SEC_EST, 3
                        ),
                        "methodology": "on_device_scan_chain",
                        # provenance: which serving path sdf-nerfacto ships
                        # by default (configs/gates.json) vs what this run
                        # actually measured
                        "gated_default_distilled": distilled_default,
                        "measured_path": "distilled_lf",
                    }
                )
            )
            return
        for impl in ("freq", "hash"):
            try:
                results[impl] = bench_implementation(impl)
            except Exception as e:  # keep the bench robust to per-impl failures
                results[impl] = 0.0
                print(f"# {impl} failed: {type(e).__name__}: {e}", flush=True)

    best_impl = max(results, key=results.get)
    rays_per_sec = results[best_impl]
    # methodology provenance (advisor r3): freq is timed as ONE on-device
    # lax.scan dispatch, hash as N_ITERS host-side dispatches over the
    # tunnel (its gather graph inside lax.scan crashed the TPU worker), so
    # the two numbers are not directly comparable — record which timing
    # mode produced the reported value.
    methodology = {
        "freq": "on_device_scan_chain",
        "hash": "per_dispatch_host_loop",
    }
    print(
        json.dumps(
            {
                "metric": f"emitter_query_rays_per_sec_per_chip[{best_impl}]",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(
                    rays_per_sec / A100_EMITTER_QUERY_RAYS_PER_SEC_EST, 3
                ),
                "methodology": methodology[best_impl],
                "samples_per_ray": list(_sample_schedule()),
                "gated_default_distilled": distilled_default,
                "measured_path": f"megakernel_{best_impl}",
            }
        )
    )


if __name__ == "__main__":
    main()
