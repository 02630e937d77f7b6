"""Benchmark: emitter-query throughput (rays/sec/chip) on real hardware.

The emitter query is THE hot loop of the reference (SURVEY.md §3.2 hot loop
#3): every escaped ray of the SDF renderer is answered by a full nerfacto
radiance evaluation (proposal sampling -> hash-grid field -> compositing).
The reference serves it with tiny-cuda-nn on A100-class GPUs at chunk 2^14
(method_configs.py:302-316).

Baseline constant: the reference publishes no rays/sec figure
(BASELINE.md), so `vs_baseline` is computed against an engineering estimate
of the reference's emitter-query throughput on one A100 (tcnn hash-grid
nerfacto eval at 48+352 samples/ray, fp16): ~1.5e6 rays/s. The north-star
target in BASELINE.json is >=5x that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

A100_EMITTER_QUERY_RAYS_PER_SEC_EST = 1.5e6


def main():
    import jax
    import jax.numpy as jnp

    from nerf_emitter_tpu.cameras.rays import RayBundle
    from nerf_emitter_tpu.models.nerfacto import NerfactoModel

    # full-size flagship config (matches reference sdf-nerfacto hot loop):
    # 2^14 rays/chunk, 48 nerf + 256/96 proposal samples, 2^19 hash table.
    num_rays = 2**14
    model = NerfactoModel(
        aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
        num_nerf_samples=48,
        num_proposal_samples=(256, 96),
        log2_hashmap_size=19,
        max_res=2048,
        num_cameras=128,
    )
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (num_rays, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBundle(
        origins=jnp.zeros((num_rays, 3)),
        directions=d,
        pixel_area=jnp.full((num_rays, 1), 1e-4),
        nears=jnp.full((num_rays, 1), 0.05),
        fars=jnp.full((num_rays, 1), 6.0),
        camera_indices=jnp.zeros((num_rays, 1), jnp.int32),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), rays)

    @jax.jit
    def emitter_query(params, rays):
        return model.apply(params, rays, train=False, hdr_radiance_only=True)["rgb"]

    # warmup / compile
    emitter_query(params, rays).block_until_ready()

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = emitter_query(params, rays)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    rays_per_sec = num_rays * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "emitter_query_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(
                    rays_per_sec / A100_EMITTER_QUERY_RAYS_PER_SEC_EST, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
