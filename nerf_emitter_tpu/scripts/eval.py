"""Eval CLI: compute image metrics (incl. relighting) -> JSON.

Re-design of nerfstudio/scripts/eval.py ComputePSNR (:36-139): loads the
run's serialized config, applies overrides (`--emitter-path` switches the
emitter to an arbitrary relighting envmap — the reference's
emitter_xml_path which flips guiding_type to 'emitter_xml',
mitsuba_sdf.py:343-346; `--test-data` points at relighting GT), restores
the checkpoint, renders the eval split and writes metrics JSON.

  python -m nerf_emitter_tpu.scripts.eval \
      --load-config outputs/lego/sdf-nerfacto/config.json \
      --emitter-path envmaps/courtyard.exr --test-data data/lego_relit \
      --output-path metrics.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax


def main(argv=None):
    from ..utils.jit_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    ap = argparse.ArgumentParser(prog="eval")
    ap.add_argument("--load-config", type=Path, required=True)
    ap.add_argument("--output-path", type=Path, default=Path("metrics.json"))
    ap.add_argument("--emitter-path", type=Path, default=None,
                    help="relighting envmap (exr/npy); replaces the NeRF emitter")
    ap.add_argument("--test-data", type=Path, default=None)
    ap.add_argument("--eval-use-mask", action="store_true")
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--checkpoint-step", type=int, default=None)
    args = ap.parse_args(argv)

    from ..configs.cli import load_config
    from ..engine.trainer import Trainer

    config = load_config(args.load_config)
    if args.test_data is not None:
        config.datacfg.test_data = args.test_data
    # NOTE: the relighting emitter swap happens AFTER checkpoint restore via
    # the public set_relight_emitter API — flipping config.guiding_type
    # before setup would change the SDF-state pytree template (vMF guiding
    # arrays / envmap slots) and break the orbax restore of a run trained
    # with a different guiding type.

    trainer = Trainer(config)
    trainer.setup()
    try:
        trainer.load_checkpoint(args.checkpoint_step)
    except FileNotFoundError:
        print("warning: no checkpoint found; evaluating fresh init")

    pipeline = trainer.pipeline
    if args.emitter_path is not None and pipeline.sdf_state is not None:
        pipeline.set_relight_emitter(args.emitter_path)

    ds = trainer.eval_dataset or trainer.dataset
    metrics = pipeline.get_average_eval_image_metrics(
        ds, jax.random.PRNGKey(0), spp=args.spp, get_std=True
    )
    out = {
        "experiment": str(config.experiment_name),
        "method": config.method_name,
        "checkpoint_dir": str(trainer.run_dir / "checkpoints"),
        "results": metrics,
    }
    args.output_path.parent.mkdir(parents=True, exist_ok=True)
    with open(args.output_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
