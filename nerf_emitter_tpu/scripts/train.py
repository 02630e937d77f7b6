"""Train CLI: `python -m nerf_emitter_tpu.scripts.train <method> [--flags]`.

Re-design of nerfstudio/scripts/train.py: the tyro method-union CLI
(train.py:259-268) becomes argparse subcommands over METHOD_CONFIGS; the
mp.spawn-per-GPU + NCCL rendezvous (train.py:105-226) is gone — one
process, one SPMD program, multi-chip via the device mesh.

Example (mirrors the reference run scripts):
  python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
      --datacfg.data /path/to/scene --experiment-name lego
"""

from __future__ import annotations

import argparse
import sys

from ..configs.cli import add_dataclass_args, dataclass_from_args
from ..configs.methods import ExperimentConfig, all_method_configs


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="train", description="TPU-native NeRF-emitter training"
    )
    subs = parser.add_subparsers(dest="method", required=True)
    methods, descriptions = all_method_configs()
    for name, factory in methods.items():
        sub = subs.add_parser(name, help=descriptions.get(name, ""))
        defaults = factory()
        add_dataclass_args(sub, ExperimentConfig)
        sub.set_defaults(**_flatten_defaults(defaults))
    return parser


def _flatten_defaults(cfg, prefix: str = "") -> dict:
    import dataclasses

    out = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        name = f"{prefix}{f.name}"
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            out.update(_flatten_defaults(v, prefix=f"{name}."))
        else:
            out[name] = v
    return out


def main(argv=None):
    from ..parallel.mesh import maybe_initialize_distributed
    from ..utils.jit_cache import enable_persistent_compilation_cache

    # Multi-host (DCN) launch: run this same command on every host with
    # NERF_EMITTER_COORDINATOR/NUM_PROCESSES/PROCESS_ID set (the
    # reference's per-machine NCCL rendezvous, train.py:140-153). After
    # this, jax.devices() is global and the trainer's mesh spans hosts.
    if maybe_initialize_distributed():
        import jax

        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}"
            f", {jax.device_count()} global devices"
        )
    enable_persistent_compilation_cache()
    parser = build_parser()
    parser_args = argv if argv is not None else sys.argv[1:]
    # resume flags live outside the dataclass config (reference
    # --load-dir / --override-start-step)
    resume = "--resume" in parser_args
    parser_args = [a for a in parser_args if a != "--resume"]
    # --load-nerf-only: restore only the NeRF train state from the
    # checkpoint, discarding any SDF takeover state — the reference's
    # load_mi_var=False (its trainer.py:91-92,418-422: keep Mitsuba voxels
    # at init while reusing the trained NeRF), used to branch takeover
    # A/B arms off one pretrained radiance field.
    load_nerf_only = "--load-nerf-only" in parser_args
    parser_args = [a for a in parser_args if a != "--load-nerf-only"]
    override_start = None
    if "--override-start-step" in parser_args:
        i = parser_args.index("--override-start-step")
        override_start = int(parser_args[i + 1])
        del parser_args[i : i + 2]

    args = parser.parse_args(parser_args)
    config = dataclass_from_args(ExperimentConfig, args)
    config.method_name = args.method

    from ..engine.trainer import Trainer

    trainer = Trainer(config)
    trainer.setup()
    start_step = 0
    if resume or override_start is not None:
        try:
            latest = trainer.ckpt.latest_step()
            trainer.load_checkpoint(latest, nerf_only=load_nerf_only)
            start_step = override_start if override_start is not None else (latest or 0)
            if load_nerf_only:
                print("load-nerf-only: restored NeRF state only")
            print(f"resumed from step {latest}, starting at {start_step}")
        except FileNotFoundError:
            print("no checkpoint to resume from; starting fresh")
    trainer.train(start_step=start_step)


if __name__ == "__main__":
    main(sys.argv[1:])
