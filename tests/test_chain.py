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
        # tiny model: the chain mechanics are what's under test, and the
        # full-size nerfacto takes minutes per program to compile on the
        # CPU mesh backend
        "--model.num-nerf-samples", "8",
        "--model.num-proposal-samples", "[16,8]",
        "--model.log2-hashmap-size", "12",
        "--model.max-res", "128",
        "--model.appearance-embedding-dim", "8",
    ]
    train_main([
        "hdr-nerfacto", *common,
        "--max-num-iterations", "10", "--train.max-steps", "10",
    ])
    hdr_dir = out / "chain" / "hdr-nerfacto"
    assert (hdr_dir / "checkpoints").exists()

    # hand-off: seed the sdf run dir with the hdr checkpoint
    sdf_dir = out / "chain" / "sdf-nerfacto"
    sdf_dir.mkdir(parents=True)
    shutil.copytree(hdr_dir / "checkpoints", sdf_dir / "checkpoints")

    # the trainer logs metrics every 10 steps, so the takeover window must
    # cover a multiple of 10
    train_main([
        "sdf-nerfacto", *common,
        "--resume", "--override-start-step", "10",
        "--pipeline.takeover-step", "10",
        "--max-num-iterations", "12", "--train.max-steps", "12",
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


def test_resume_past_upsample(tmp_path):
    """Crash-resume AFTER a volume upsample step: the checkpoint stores the
    SDF at the upsampled resolution, so the restore template must be built
    from checkpoint METADATA, not fresh-init shapes (regression: the round-2
    production run crash-looped on every resume past mi-step 64 with
    'Requested shape (64,64,64,1) is not compatible with (127,127,127,1)')."""
    import json

    from nerf_emitter_tpu.engine.checkpoints import CheckpointManager
    from nerf_emitter_tpu.renderer.optimize import (
        OPT_CONFIGS,
        SdfOptConfig,
        _default_variables,
    )
    from nerf_emitter_tpu.renderer.scene import DIFFUSE
    from nerf_emitter_tpu.scripts.gen_data import main as gen_main
    from nerf_emitter_tpu.scripts.train import main as train_main

    OPT_CONFIGS.setdefault(
        "test-tiny-upsample",
        SdfOptConfig(
            name="test-tiny-upsample",
            bsdf_type=DIFFUSE,
            loss="relative_l1",
            variables=_default_variables(3e-3, (2,)),
            init_res=8,
            tex_res=8,
            render_upsample_iter=(2,),
        ),
    )
    scene = tmp_path / "scene"
    gen_main(["--object", "sphere", "--n-views", "4", "--width", "10",
              "--height", "10", "--spp", "2", "--out", str(scene)])
    out = tmp_path / "runs"
    args = [
        "sdf-nerfacto",
        "--datacfg.data", str(scene),
        "--experiment-name", "up", "--output-dir", str(out),
        "--train.num-rays-per-batch", "64",
        "--pipeline.takeover-step", "2",
        "--opt-config-name", "test-tiny-upsample",
        "--pipeline.spp", "2", "--pipeline.takeover-image-size", "8",
        "--pipeline.batch-size", "1", "--pipeline.sdf-init", "sphere",
        "--steps-per-save", "1000", "--steps-per-eval-image", "1000",
        "--model.num-nerf-samples", "8",
        "--model.num-proposal-samples", "[16,8]",
        "--model.log2-hashmap-size", "12", "--model.max-res", "128",
    ]
    train_main(args + ["--max-num-iterations", "6", "--train.max-steps", "6"])
    ckpt_dir = out / "up" / "sdf-nerfacto" / "checkpoints"
    meta = CheckpointManager(ckpt_dir).metadata_tree()
    # premise: the saved checkpoint really is PAST the upsample (8 -> 15)
    assert tuple(meta["sdf"]["scene"]["sdf"].shape) == (15, 15, 15, 1)

    # resume from it (fresh process state is emulated by a fresh Trainer
    # inside train_main) and run on past step 10 (metrics flush every 10
    # steps, so the post-resume takeover rows need a multiple of 10)
    train_main(args + [
        "--resume", "--max-num-iterations", "12", "--train.max-steps", "12",
    ])
    meta2 = CheckpointManager(ckpt_dir).metadata_tree()
    assert tuple(meta2["sdf"]["scene"]["sdf"].shape) == (15, 15, 15, 1)
    events = (out / "up" / "sdf-nerfacto" / "logs" / "events.jsonl").read_text()
    post = [
        json.loads(ln) for ln in events.splitlines()
        if json.loads(ln).get("step", 0) >= 10
    ]
    assert any("view_loss" in row for row in post), post
    assert all(
        np.isfinite(row["view_loss"]) for row in post if "view_loss" in row
    )


def test_resume_with_drifted_optimizer_structure(tmp_path, capsys):
    """Checkpoint restore must survive an SDF optimizer hyper-STRUCTURE
    change between save and restore (regression: round 4 shipped
    uniform_adam + lr_decay_at_up for the sdf variable, and every
    eval/resume of a checkpoint written under per-coordinate Adam crashed
    in the orbax template match), and --load-nerf-only must read only the
    NeRF subtree so it is immune to any SDF-side drift."""
    import dataclasses
    import json

    from nerf_emitter_tpu.renderer.optimize import (
        OPT_CONFIGS,
        SdfOptConfig,
        _default_variables,
    )
    from nerf_emitter_tpu.renderer.scene import DIFFUSE
    from nerf_emitter_tpu.scripts.gen_data import main as gen_main
    from nerf_emitter_tpu.scripts.train import main as train_main

    def tiny_cfg(variables):
        return SdfOptConfig(
            name="test-opt-drift", bsdf_type=DIFFUSE, loss="relative_l1",
            variables=variables, init_res=8, tex_res=8,
        )

    adam_vars = tuple(
        dataclasses.replace(v, optimizer="adam", lr_decay_at_up=1.0)
        for v in _default_variables(3e-3, ())
    )
    OPT_CONFIGS["test-opt-drift"] = tiny_cfg(adam_vars)

    scene = tmp_path / "scene"
    gen_main(["--object", "sphere", "--n-views", "4", "--width", "10",
              "--height", "10", "--spp", "2", "--out", str(scene)])
    out = tmp_path / "runs"
    args = [
        "sdf-nerfacto",
        "--datacfg.data", str(scene),
        "--experiment-name", "drift", "--output-dir", str(out),
        "--train.num-rays-per-batch", "64",
        "--pipeline.takeover-step", "2",
        "--opt-config-name", "test-opt-drift",
        "--pipeline.spp", "2", "--pipeline.takeover-image-size", "8",
        "--pipeline.batch-size", "1", "--pipeline.sdf-init", "sphere",
        "--steps-per-save", "1000", "--steps-per-eval-image", "1000",
        "--model.num-nerf-samples", "8",
        "--model.num-proposal-samples", "[16,8]",
        "--model.log2-hashmap-size", "12", "--model.max-res", "128",
    ]
    train_main(args + ["--max-num-iterations", "4", "--train.max-steps", "4"])

    # the optimizer recipe changes AFTER the checkpoint was written
    uadam_vars = tuple(
        dataclasses.replace(v, optimizer="uniform_adam")
        if v.name == "sdf" else v
        for v in adam_vars
    )
    OPT_CONFIGS["test-opt-drift"] = tiny_cfg(uadam_vars)

    # full resume: params restore, moments re-init fresh, training continues
    train_main(args + [
        "--resume", "--max-num-iterations", "12", "--train.max-steps", "12",
    ])
    assert "optimizer structure drifted" in capsys.readouterr().out
    events = (out / "drift" / "sdf-nerfacto" / "logs" / "events.jsonl").read_text()
    post = [
        json.loads(ln) for ln in events.splitlines()
        if json.loads(ln).get("step", 0) >= 10
    ]
    assert any("view_loss" in row for row in post), post
    assert all(
        np.isfinite(row["view_loss"]) for row in post if "view_loss" in row
    )

    # --load-nerf-only from the same (takeover, drifted-structure)
    # checkpoint: must not touch the SDF subtree at all
    nerf_only_out = tmp_path / "runs" / "drift2" / "sdf-nerfacto"
    nerf_only_out.mkdir(parents=True)
    shutil.copytree(
        out / "drift" / "sdf-nerfacto" / "checkpoints",
        nerf_only_out / "checkpoints",
    )
    # rename the seed below the new run's save steps (orbax skips saves at
    # steps <= the directory's latest; same trick as the A/B stage queue)
    (latest_dir,) = [
        p for p in (nerf_only_out / "checkpoints").iterdir() if p.name.isdigit()
    ]
    latest_dir.rename(latest_dir.parent / "1")
    train_main([
        a if a != "drift" else "drift2" for a in args
    ] + [
        "--resume", "--load-nerf-only", "--override-start-step", "2",
        # metrics flush every 10 steps: run past step 10 so the takeover
        # writes at least one view_loss row to assert on
        "--max-num-iterations", "12", "--train.max-steps", "12",
    ])
    assert "restored NeRF state only" in capsys.readouterr().out
    events2 = (nerf_only_out / "logs" / "events.jsonl").read_text()
    assert any("view_loss" in ln for ln in events2.splitlines())


def test_gen_data_resume_identical(tmp_path):
    """--resume after deleting half the views re-renders ONLY the missing
    ones, bit-identically (key streams advance over skipped views)."""
    from nerf_emitter_tpu.scripts.gen_data import main as gen_main
    from nerf_emitter_tpu.utils import exr

    out = tmp_path / "scene"
    args = ["--object", "sphere", "--n-views", "4", "--width", "8",
            "--height", "8", "--spp", "2", "--out", str(out)]
    gen_main(args)
    imgs = sorted(out.glob("r_*.exr"))
    assert len(imgs) == 4
    want = [exr.read_exr(p) for p in imgs]
    # drop views 1 and 3, resume
    imgs[1].unlink()
    imgs[3].unlink()
    gen_main(args + ["--resume"])
    got = [exr.read_exr(p) for p in sorted(out.glob("r_*.exr"))]
    assert len(got) == 4
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)


def test_render_cli_interpolate_and_spiral(tmp_path):
    """The render CLI's interpolate and spiral subcommands (reference
    render.py:808-818) drive a pretrain-only checkpoint end to end."""
    from nerf_emitter_tpu.scripts.gen_data import main as gen_main
    from nerf_emitter_tpu.scripts.render import main as render_main
    from nerf_emitter_tpu.scripts.train import main as train_main

    scene = tmp_path / "scene"
    gen_main(["--object", "sphere", "--n-views", "4", "--width", "10",
              "--height", "10", "--spp", "2", "--out", str(scene)])
    out = tmp_path / "runs"
    train_main([
        "nerfacto",
        "--datacfg.data", str(scene),
        "--experiment-name", "r", "--output-dir", str(out),
        "--train.num-rays-per-batch", "64",
        "--max-num-iterations", "2", "--train.max-steps", "2",
        "--steps-per-save", "1000", "--steps-per-eval-image", "1000",
        "--model.num-nerf-samples", "8",
        "--model.num-proposal-samples", "[16,8]",
        "--model.log2-hashmap-size", "12", "--model.max-res", "128",
        "--model.appearance-embedding-dim", "4",
    ])
    cfg = out / "r" / "nerfacto" / "config.json"
    for sub, tag in (("interpolate", "interp"), ("spiral", "spiral")):
        dst = tmp_path / sub
        render_main([
            sub, "--load-config", str(cfg), "--output-path", str(dst),
            "--spp", "1", "--n-frames", "2",
        ])
        frames = list(dst.glob(f"{tag}_*"))
        assert len(frames) >= 2, (sub, list(dst.iterdir()))


def test_eval_cli_relight_preserves_run_config(tmp_path):
    """Relighting eval through the CLI: restore a vMF-guided takeover
    checkpoint, swap the emitter AFTER restore (a pre-setup guiding_type
    flip changes the SDF-state pytree template and breaks the orbax
    restore), and never rewrite the run's config.json (eval/render tools
    construct a Trainer from an overridden config)."""
    import json

    from nerf_emitter_tpu.scripts.eval import main as eval_main
    from nerf_emitter_tpu.scripts.gen_data import main as gen_main
    from nerf_emitter_tpu.scripts.train import main as train_main
    from nerf_emitter_tpu.utils import exr

    scene = tmp_path / "scene"
    gen_main(["--object", "sphere", "--n-views", "4", "--width", "10",
              "--height", "10", "--spp", "2", "--out", str(scene)])
    out = tmp_path / "runs"
    train_main([
        "sdf-nerfacto",
        "--datacfg.data", str(scene),
        "--experiment-name", "rl", "--output-dir", str(out),
        "--train.num-rays-per-batch", "64",
        "--pipeline.takeover-step", "2",
        "--max-num-iterations", "4", "--train.max-steps", "4",
        "--pipeline.spp", "2", "--pipeline.takeover-image-size", "8",
        "--pipeline.batch-size", "1", "--pipeline.sdf-init", "sphere",
        "--steps-per-save", "1000", "--steps-per-eval-image", "1000",
        "--model.num-nerf-samples", "8",
        "--model.num-proposal-samples", "[16,8]",
        "--model.log2-hashmap-size", "12", "--model.max-res", "128",
    ])
    cfg_path = out / "rl" / "sdf-nerfacto" / "config.json"
    cfg_before = cfg_path.read_text()
    assert json.loads(cfg_before)["pipeline"]["guiding_type"] == "vmf"

    img = exr.read_exr(scene / "env.exr")
    relit = tmp_path / "env_relit.exr"
    exr.write_exr(relit, np.roll(img[..., :3], img.shape[1] // 2, axis=1))

    metrics_path = tmp_path / "relight_metrics.json"
    eval_main([
        "--load-config", str(cfg_path),
        "--emitter-path", str(relit), "--test-data", str(scene),
        "--spp", "2", "--output-path", str(metrics_path),
    ])
    res = json.loads(metrics_path.read_text())["results"]
    assert np.isfinite(list(res.values())).all()
    assert cfg_path.read_text() == cfg_before  # eval never rewrites it
