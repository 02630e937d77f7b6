"""Tests for the real-capture stack: nerfstudio dataparser, occlusion
compositing."""

import json

import jax.numpy as jnp
import numpy as np

from nerf_emitter_tpu.data.dataparsers.nerfstudio import (
    NerfstudioDataparserConfig,
    parse_nerfstudio,
)
from nerf_emitter_tpu.data.occlusion import OcclusionData, composite_with_occlusion


def _write_scene(tmp_path, n=6, with_rotations=True):
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n):
        th = 2 * np.pi * i / n
        c2w = np.eye(4)
        c2w[:3, 3] = 3.0 * np.array([np.cos(th), 0.5, np.sin(th)])
        img = rng.random((8, 8, 3)).astype(np.float32)
        np.save(tmp_path / f"im_{i}.npy", img)
        fr = {
            "file_path": f"im_{i}.npy",
            "transform_matrix": c2w.tolist(),
            "rotation": (i % 3) * 30 if with_rotations else 0,
        }
        frames.append(fr)
    meta = {
        "fl_x": 100.0, "fl_y": 100.0, "cx": 4.0, "cy": 4.0, "w": 8, "h": 8,
        "frames": frames,
    }
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump(meta, f)
    return tmp_path


def test_nerfstudio_parser_basic(tmp_path):
    _write_scene(tmp_path)
    cfg = NerfstudioDataparserConfig(data=tmp_path, eval_mode="all")
    out = parse_nerfstudio(cfg, "train")
    assert out.camera_to_worlds.shape == (6, 3, 4)
    # auto-scale: camera positions within unit box
    assert np.abs(out.camera_to_worlds[:, :3, 3]).max() <= 1.0 + 1e-5
    assert out.rotation_ids.tolist() == [0, 1, 2, 0, 1, 2]
    assert not out.is_hdr or out.is_hdr  # npy counts as hdr
    assert out.metadata["downscale_factor"] == 1


def test_nerfstudio_parser_filter_rotation(tmp_path):
    _write_scene(tmp_path)
    cfg = NerfstudioDataparserConfig(
        data=tmp_path, eval_mode="all", filter_rotation=0
    )
    out = parse_nerfstudio(cfg, "train")
    assert len(out.image_filenames) == 2  # rotations 0 at i=0,3
    assert all(r == 0 for r in out.rotation_ids)


def test_nerfstudio_parser_split(tmp_path):
    _write_scene(tmp_path, n=10)
    cfg = NerfstudioDataparserConfig(data=tmp_path, eval_mode="interval", eval_interval=5)
    train = parse_nerfstudio(cfg, "train")
    val = parse_nerfstudio(cfg, "val")
    assert len(train.image_filenames) == 8
    assert len(val.image_filenames) == 2


def test_occlusion_compositing():
    h = w = 4
    occ = OcclusionData(
        occlusion_rgb=jnp.full((1, h, w, 3), 0.9),
        occlusion_mask=jnp.zeros((1, h, w, 1)).at[0, 0, 0, 0].set(1.0),
        background_rgb=jnp.full((1, h, w, 3), 0.1),
    )
    render = jnp.full((h, w, 3), 0.5)
    mask = jnp.ones((h, w, 1)).at[1, 1, 0].set(0.0)
    out = composite_with_occlusion(render, mask, occ, 0)
    # occluded pixel shows occluder
    np.testing.assert_allclose(out[0, 0], 0.9, atol=1e-6)
    # object pixel shows render
    np.testing.assert_allclose(out[2, 2], 0.5, atol=1e-6)
    # off-object pixel shows background
    np.testing.assert_allclose(out[1, 1], 0.1, atol=1e-6)
