"""On-chip A/B of the emitter-query sample schedule knob.

The emitter query integrates over >=64 spp, so a reduced per-ray sample
schedule (pipeline.emitter_samples) trades invisible per-ray variance for
throughput. This measures the megafused query at the reference schedule
(256/96 proposals + 48 nerf samples — the bench configuration, reference
base_model.py:292-313) against halved and quartered schedules, and the
radiance RMS deviation each one introduces.

Pass --load-config <run>/config.json to measure the deviation on a
TRAINED field (the representative number); without it the script falls
back to a randomly initialized field and says so — random-field deviation
is a smoke signal only, real fields are smoother.

    python scripts/profile_emitter_samples.py \
        [--load-config /tmp/r2_out/prod/sdf-nerfacto/config.json]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_emitter_tpu.cameras.rays import RayBundle
from nerf_emitter_tpu.models.nerfacto import NerfactoModel
from nerf_emitter_tpu.ops.mega_query import make_mega_radiance_query

NUM_RAYS = 2**16
N_ITERS = 8
SCHEDULES = [
    ("reference", (256, 96), 48),
    ("half", (128, 48), 24),
    ("quarter", (64, 24), 16),
]


def timed(fn, *args):
    np.asarray(fn(*args))  # compile + true sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / N_ITERS * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--load-config", default=None,
        help="run config.json: measure on that run's TRAINED field",
    )
    args = ap.parse_args()

    if args.load_config:
        from nerf_emitter_tpu.configs.cli import load_config
        from nerf_emitter_tpu.engine.trainer import Trainer

        trainer = Trainer(load_config(args.load_config))
        trainer.setup()
        trainer.load_checkpoint()
        base = trainer.model.clone(
            num_proposal_samples=(256, 96), num_nerf_samples=48
        )
        params = trainer.pipeline.nerf_state.params
        print(f"field: trained checkpoint from {args.load_config}")
    else:
        base = NerfactoModel(
            aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
            num_nerf_samples=48,
            num_proposal_samples=(256, 96),
            log2_hashmap_size=19,
            max_res=2048,
            num_cameras=128,
            implementation="freq",
        )
        params = None
        print(
            "field: RANDOM INIT (no --load-config) — rel-RMS deviations "
            "below are a smoke signal only; trained fields are smoother"
        )
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (NUM_RAYS, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBundle(
        origins=jnp.zeros((NUM_RAYS, 3)),
        directions=d,
        pixel_area=jnp.full((NUM_RAYS, 1), 1e-4),
        nears=jnp.full((NUM_RAYS, 1), 0.3),
        fars=jnp.full((NUM_RAYS, 1), 10.0),
        camera_indices=jnp.zeros((NUM_RAYS, 1), jnp.int32),
    )
    if params is None:
        params = jax.jit(base.init)(jax.random.PRNGKey(1), rays)

    ref_rgb = None
    for name, props, ns in SCHEDULES:
        model = base.clone(num_proposal_samples=props, num_nerf_samples=ns)
        query = jax.jit(make_mega_radiance_query(model))
        ms = timed(lambda r: query(params, r), rays)
        rgb = np.asarray(query(params, rays))
        if ref_rgb is None:
            ref_rgb = rgb
            dev = 0.0
        else:
            dev = float(
                np.sqrt(np.mean((rgb - ref_rgb) ** 2))
                / (np.sqrt(np.mean(ref_rgb**2)) + 1e-12)
            )
        print(
            f"{name:9s} props={props} nerf={ns}: {ms:7.2f} ms "
            f"({NUM_RAYS / ms * 1e3 / 1e6:.2f}M rays/s)  rel-RMS vs ref {dev:.4f}"
        )


if __name__ == "__main__":
    main()
