"""Smoke: the shard_map-wrapped megafused emitter query serves under a
jax.sharding.Mesh on the real TPU backend (the sandbox has one chip, so the
mesh is 1-wide — the shard_map wrapping and collective-free SPMD region are
identical at any width; 8-wide parity is covered on the CPU mesh in
tests/test_multichip.py). Asserts bit-parity with the unsharded fused query.

    python scripts/round2/fused_mesh_smoke.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from nerf_emitter_tpu.cameras.rays import RayBundle
from nerf_emitter_tpu.models.nerfacto import NerfactoModel
from nerf_emitter_tpu.pipelines.nerf_emitter import make_nerf_emitter_fn

N = 4096


def main():
    assert jax.default_backend() == "tpu", "run on the TPU backend"
    model = NerfactoModel(
        aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
        num_nerf_samples=48,
        num_proposal_samples=(256, 96),
        log2_hashmap_size=16,
        max_res=1024,
        num_cameras=8,
        implementation="freq",
    )
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBundle(
        origins=jnp.zeros((N, 3)),
        directions=d,
        pixel_area=jnp.full((N, 1), 1e-4),
        nears=jnp.full((N, 1), 0.05),
        fars=jnp.full((N, 1), 6.0),
        camera_indices=jnp.zeros((N, 1), jnp.int32),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), rays)
    aabb = jnp.asarray([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]])

    plain = make_nerf_emitter_fn(model, 1.0, aabb)(params)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    sharded = make_nerf_emitter_fn(
        model, 1.0, aabb, mesh=mesh, data_axis="data"
    )(params)

    x = jnp.full((N, 3), 0.5)
    r0 = np.asarray(plain(x, d))
    r1 = np.asarray(sharded(x, d))
    assert np.isfinite(r0).all() and np.isfinite(r1).all()
    np.testing.assert_allclose(r1, r0, rtol=1e-5, atol=1e-6)
    print("fused_mesh_smoke OK: shard_map fused query == unsharded fused query on TPU")


if __name__ == "__main__":
    main()
