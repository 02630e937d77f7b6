"""Tests for the real-capture stack: nerfstudio dataparser, occlusion
compositing."""

import json

import jax

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


# ---------------------------------------------------------------- rotater


def _turntable_rotater(n=4):
    from nerf_emitter_tpu.fields.rotater import Rotater

    return Rotater.from_axis_angle(n, center=jnp.zeros(3))


def test_rotater_positions_within_roundtrip():
    """apply_positions_within inverts canonical->world: a canonical point
    rotated into the world by R_i maps back to itself; points outside the
    sphere are untouched."""
    rot = _turntable_rotater(4)
    rid = jnp.array([1, 2])
    p_canon = jnp.array([[0.1, 0.05, 0.2], [0.2, 0.0, 0.1]])
    p_world = rot.apply_points(rid, p_canon)
    # one far sample appended per ray (outside radius 0.5)
    pos = jnp.stack(
        [jnp.stack([p_world[0], jnp.array([3.0, 0.0, 0.0])]),
         jnp.stack([p_world[1], jnp.array([0.0, 0.0, 4.0])])]
    )  # (2, 2, 3)
    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), pos.shape)
    out, out_d = rot.apply_positions_within(rid, pos, dirs, bounding_radius=0.5)
    np.testing.assert_allclose(out[:, 0], p_canon, atol=1e-5)
    np.testing.assert_allclose(out[:, 1], pos[:, 1], atol=1e-6)  # untouched
    # inside dirs are rotated, outside untouched
    np.testing.assert_allclose(out_d[:, 1], dirs[:, 1], atol=1e-6)


def test_rotater_c2w_inverse_consistency():
    """Rays from apply_c2w_inverse(c2w) equal inverse-rotated world rays."""
    rot = _turntable_rotater(8)
    rid = jnp.array([3])
    c2w = jnp.array([[[1.0, 0, 0, 0.4], [0, 1.0, 0, 0.2], [0, 0, 1.0, 1.5]]])
    c2w_canon = rot.apply_c2w_inverse(rid, c2w)
    # the camera origin in canonical frame == inverse-rotated world origin
    o_canon, d_canon = rot.apply_rays_within(
        rid, c2w[:, :3, 3], c2w[:, :3, 2]
    )
    np.testing.assert_allclose(c2w_canon[:, :3, 3], o_canon, atol=1e-5)
    np.testing.assert_allclose(c2w_canon[:, :3, 2], d_canon, atol=1e-5)


def test_sensor_rays_with_rotation():
    """camera_rays_in_render_space(rotater, rot_id) inverse-rotates rays."""
    from nerf_emitter_tpu.cameras.cameras import Cameras
    from nerf_emitter_tpu.renderer.sensors import camera_rays_in_render_space

    rot = _turntable_rotater(4)
    c2w = jnp.array([[[1.0, 0, 0, 0.0], [0, 1.0, 0, 0.0], [0, 0, 1.0, 1.2]]])
    cams = Cameras(
        camera_to_worlds=c2w,
        fx=jnp.array([20.0]), fy=jnp.array([20.0]),
        cx=jnp.array([4.0]), cy=jnp.array([4.0]), width=8, height=8,
    )
    o0, d0 = camera_rays_in_render_space(cams, jnp.int32(0), 8, 8, 1.0)
    o1, d1 = camera_rays_in_render_space(
        cams, jnp.int32(0), 8, 8, 1.0, rotater=rot, rot_id=jnp.int32(1)
    )
    # rot id 1 = 90 deg about +y: rotating back the +z camera sends it to -x
    # direction-wise; check norms preserved and rays actually rotated
    np.testing.assert_allclose(
        jnp.linalg.norm(d1, axis=-1), jnp.linalg.norm(d0, axis=-1), atol=1e-5
    )
    assert float(jnp.abs(d1 - d0).max()) > 0.1


def test_sdf_step_with_occlusion_composites():
    """The occlusion-aware SDF step runs and the composited prediction
    changes the view loss vs the same step without occlusion."""
    from nerf_emitter_tpu.cameras.cameras import Cameras
    from nerf_emitter_tpu.pipelines.sdf_optimizer import (
        SdfOptState,
        TakeoverConfig,
        build_sdf_optimizer,
        make_sdf_train_step,
    )
    from nerf_emitter_tpu.renderer.emitters import EnvmapEmitter
    from nerf_emitter_tpu.renderer.integrator import RenderConfig
    from nerf_emitter_tpu.renderer.optimize import SdfOptConfig, VariableSpec
    from nerf_emitter_tpu.renderer.sphere_trace import SphereTraceConfig

    h = w = 16
    env = EnvmapEmitter.create(jnp.ones((8, 16, 3)))
    from nerf_emitter_tpu.renderer.scene import SdfScene

    scene = SdfScene.create(sdf_res=17, tex_res=4, envmap=env, init_albedo=0.5)
    c2w = jnp.array([[[1.0, 0, 0, 0.5], [0, 1.0, 0, 0.5], [0, 0, 1.0, 1.9]]])
    cams = Cameras(
        camera_to_worlds=c2w,
        fx=jnp.array([24.0]), fy=jnp.array([24.0]),
        cx=jnp.array([w / 2]), cy=jnp.array([h / 2]), width=w, height=h,
    )
    opt_cfg = SdfOptConfig(
        name="t", bsdf_type=0, loss="relative_l1",
        variables=(
            VariableSpec("sdf", lr=1e-3, redistance_freq=0),
            VariableSpec("albedo", lr=1e-2, clamp=(0.0, 1.0)),
            VariableSpec("roughness", lr=0.0, clamp=(0.02, 1.0)),
        ),
        init_res=17, tex_res=4, render_upsample_iter=(), curvature_mult=0.0,
    )
    rconf = RenderConfig(trace=SphereTraceConfig(max_steps=24, t_max=3.0))
    takeover = TakeoverConfig(spp=2, image_height=h, image_width=w, scene_scale=1.0)
    tx = build_sdf_optimizer(opt_cfg)
    state = SdfOptState(step=jnp.int32(0), scene=scene, opt_state=tx.init(scene))

    gt = jnp.full((1, h, w, 3), 0.4)
    mask = jnp.ones((1, h, w, 1))
    key = jax.random.PRNGKey(0)
    cam_idx = jnp.zeros((1,), jnp.int32)

    plain = make_sdf_train_step(opt_cfg, takeover, tx, render_config=rconf)
    # the step donates its state argument -> hand it a deep copy
    _, m0 = plain(jax.tree.map(jnp.array, state), cams, cam_idx, gt, mask, key)
    occ_step = make_sdf_train_step(
        opt_cfg, takeover, tx, render_config=rconf, use_occlusion=True
    )
    occ_layers = (
        jnp.full((1, h, w, 3), 0.9),           # occluder color
        jnp.full((1, h, w, 1), 1.0),           # fully occluded
        jnp.full((1, h, w, 3), 0.1),           # background
    )
    _, m1 = occ_step(state, cams, cam_idx, gt, mask, key, occ_layers)
    # fully occluded -> pred == occluder color 0.9 vs gt 0.4 everywhere
    assert abs(float(m1["view_loss"]) - float(m0["view_loss"])) > 1e-3
    # internal mask weight kills the mask loss under full occlusion
    np.testing.assert_allclose(float(m1["mask_loss"]), 0.0, atol=1e-6)
