"""Export CLI: SDF checkpoint -> textured mesh.

Re-design of nerfstudio/scripts/exporter.py `mi-marching-cubes`
(:456-582): load the optimized SDF grid from a checkpointed run (or a raw
.npy volume), run (multi-res) iso-surface extraction, texture from the
albedo/roughness volumes, write OBJ/PLY + the raw volumes as .npy (the
reference re-exports .vol grids).

  python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --load-config outputs/lego/sdf-nerfacto/config.json \
      --resolution 512 --output-dir exports/lego
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def cmd_marching_cubes(args):
    from ..exporter.marching_cubes import (
        sample_vertex_attributes,
        upsampled_marching_cubes,
        write_obj,
        write_ply,
    )

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.sdf_volume is not None:
        sdf = np.load(args.sdf_volume)
        albedo = np.load(args.albedo_volume) if args.albedo_volume else None
        roughness = None
    else:
        from ..configs.cli import load_config
        from ..engine.trainer import Trainer

        config = load_config(args.load_config)
        trainer = Trainer(config)
        trainer.setup()
        # Restore via the trainer's template path (begin_takeover_template at
        # the STORED grid resolution, trainer.py load_checkpoint) — NOT the
        # full begin_takeover(), whose TSDF fusion / light-pc / GMM init ran
        # for hours on the 1-core CPU export host and wedged the round-4
        # stage queue. bind=False: the exporter only needs the scene arrays.
        try:
            trainer.load_checkpoint(args.checkpoint_step, bind=False)
        except FileNotFoundError:
            print("warning: no checkpoint; exporting init scene")
        if trainer.pipeline.sdf_state is None:
            # pretrain-only checkpoint (or none): export the init-template
            # scene so the CLI still produces a mesh to look at
            trainer.pipeline.begin_takeover_template()
        scene = trainer.pipeline.sdf_state.scene
        sdf = np.asarray(scene.sdf)
        albedo = np.asarray(scene.albedo)
        roughness = np.asarray(scene.roughness)

    res = args.resolution
    verts, faces = upsampled_marching_cubes(sdf, res)
    print(f"extracted {len(verts)} verts / {len(faces)} faces at res {res}")

    colors = None
    if albedo is not None:
        attrs = sample_vertex_attributes(verts, albedo, roughness)
        colors = attrs["albedo"]

    write_obj(out_dir / "mesh.obj", verts, faces, colors)
    write_ply(out_dir / "mesh.ply", verts, faces, colors)
    np.save(out_dir / "sdf.npy", sdf)
    if albedo is not None:
        np.save(out_dir / "albedo.npy", albedo)
    if roughness is not None:
        np.save(out_dir / "roughness.npy", roughness)
    print(f"wrote mesh + volumes to {out_dir}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="exporter")
    subs = ap.add_subparsers(dest="cmd", required=True)
    mc = subs.add_parser("mi-marching-cubes")
    mc.add_argument("--load-config", type=Path, default=None)
    mc.add_argument("--sdf-volume", type=Path, default=None,
                    help="raw .npy SDF volume instead of a checkpoint")
    mc.add_argument("--albedo-volume", type=Path, default=None)
    mc.add_argument("--resolution", type=int, default=512)
    mc.add_argument("--checkpoint-step", type=int, default=None)
    mc.add_argument("--output-dir", type=Path, default=Path("exports"))
    mc.set_defaults(fn=cmd_marching_cubes)
    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
