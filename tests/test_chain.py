"""Regression test of the real-capture chain (scripts/real/ours/run.sh):
hdr-nerfacto pretrain -> checkpoint hand-off -> sdf-nerfacto resumed at the
takeover step (the reference's --load-dir + --override-start-step chain,
reference scripts/real/ours/run.sh:24-25), with a turntable dataset
(rotations) and occlusion compositing enabled.

Tiny scale — this tests the MECHANICS (dataset tags -> rotater, checkpoint
restore across method configs, takeover start from a foreign checkpoint),
not quality.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def turntable_scene(tmp_path_factory):
    out = tmp_path_factory.mktemp("ttscene")
    from nerf_emitter_tpu.scripts.gen_data import main as gen_main

    gen_main([
        "--object", "sphere", "--n-views", "6", "--width", "12",
        "--height", "12", "--spp", "2", "--n-rotations", "3",
        "--path-type", "spiral", "--out", str(out),
    ])
    return out


def test_hdr_to_sdf_checkpoint_chain(turntable_scene, tmp_path):
    from nerf_emitter_tpu.scripts.train import main as train_main

    out = tmp_path / "runs"
    common = [
        "--datacfg.data", str(turntable_scene),
        "--experiment-name", "chain", "--output-dir", str(out),
        "--train.num-rays-per-batch", "64",
        "--pipeline.tsdf-init-res", "24",
        "--steps-per-save", "1000", "--steps-per-eval-image", "1000",
    ]
    train_main([
        "hdr-nerfacto", *common,
        "--max-num-iterations", "4", "--train.max-steps", "4",
    ])
    hdr_dir = out / "chain" / "hdr-nerfacto"
    assert (hdr_dir / "checkpoints").exists()

    # hand-off: seed the sdf run dir with the hdr checkpoint
    sdf_dir = out / "chain" / "sdf-nerfacto"
    sdf_dir.mkdir(parents=True)
    shutil.copytree(hdr_dir / "checkpoints", sdf_dir / "checkpoints")

    train_main([
        "sdf-nerfacto", *common,
        "--resume", "--override-start-step", "4",
        "--pipeline.takeover-step", "4",
        "--max-num-iterations", "6", "--train.max-steps", "6",
        "--pipeline.spp", "2", "--pipeline.takeover-image-size", "8",
        "--pipeline.batch-size", "1",
        "--pipeline.use-occlusion", "true",
        "--pipeline.sdf-init", "sphere",
    ])
    # takeover ran: events log has takeover metrics rows
    events = (sdf_dir / "logs" / "events.jsonl").read_text().splitlines()
    assert any("view_loss" in ln for ln in events), events[-3:]
    vals = [
        v for ln in events for k, v in __import__("json").loads(ln).items()
        if k == "view_loss"
    ]
    assert np.isfinite(vals).all()
