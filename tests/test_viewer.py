"""Viewer server roundtrip tests: page, render modes, metrics sparkline
feed, and the keyframe -> camera-path export consumed by
`scripts/render.py camera-path --camera-path-file`."""

import json
import urllib.error
import urllib.request

import numpy as np

from nerf_emitter_tpu.viewer.server import (
    ViewerState,
    keyframes_to_camera_path,
    start_viewer,
)


def _fake_render(theta, phi, radius, w, h, target=(0, 0, 0), fov_deg=40.0,
                 spp=4, mode="rgb", light_angle=0.0):
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = 0.5 if mode == "rgb" else 1.0
    return img


def test_viewer_serves_page_render_and_metrics(tmp_path):
    state = ViewerState(_fake_render, save_dir=tmp_path)
    state.put_metrics(10, {"loss": 1.5})
    state.put_metrics(20, {"loss": 1.0})
    server = start_viewer(state, port=0)  # ephemeral port
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"viewer" in page and b"keyframe" in page

        for mode in ("rgb", "depth", "accumulation", "normal"):
            png = urllib.request.urlopen(
                base + f"/render?theta=0&phi=0&w=16&h=16&mode={mode}&spp=2",
                timeout=30,
            ).read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n"

        status = json.loads(
            urllib.request.urlopen(base + "/status", timeout=10).read()
        )
        assert status["step"] == 20
        metrics = json.loads(
            urllib.request.urlopen(base + "/metrics", timeout=10).read()
        )
        assert metrics["losses"] == [[10, 1.5], [20, 1.0]]

        # keyframe export roundtrip: POST writes camera_path.json
        body = json.dumps(
            {"keyframes": [
                {"theta": 0.0, "phi": 0.3, "radius": 2.0, "fov": 50},
                {"theta": 1.0, "phi": 0.3, "radius": 2.0, "fov": 50},
            ], "n_frames": 8}
        ).encode()
        req = urllib.request.Request(
            base + "/save_path", data=body, method="POST"
        )
        msg = urllib.request.urlopen(req, timeout=10).read().decode()
        assert "camera_path.json" in msg
        spec = json.loads((tmp_path / "camera_path.json").read_text())
        assert len(spec["keyframes"]) == 2 and spec["n_frames"] == 8
        c2w = np.asarray(spec["keyframes"][0]["c2w"])
        assert c2w.shape == (3, 4)
    finally:
        server.shutdown()


def test_keyframes_to_camera_path_geometry():
    """The exported c2w looks at the target from the orbit position."""
    spec = keyframes_to_camera_path(
        {"keyframes": [{"theta": 0.0, "phi": 0.0, "radius": 2.0,
                        "target": [0, 0, 0], "fov": 40}]}
    )
    c2w = np.asarray(spec["keyframes"][0]["c2w"])
    eye = c2w[:, 3]
    np.testing.assert_allclose(np.linalg.norm(eye), 2.0, rtol=1e-5)
    # camera -z axis (look direction) points at the origin
    fwd = -c2w[:, 2]
    np.testing.assert_allclose(
        fwd, -eye / np.linalg.norm(eye), atol=1e-5
    )


def test_render_cli_camera_path_file(tmp_path):
    """scripts/render.py camera-path interpolates a keyframe file into
    n_frames poses (pose-construction only — pipeline rendering is covered
    by the slow-tier render CLI tests)."""
    spec = keyframes_to_camera_path(
        {"keyframes": [
            {"theta": 0.0, "phi": 0.2, "radius": 2.0, "fov": 40},
            {"theta": 1.5, "phi": 0.4, "radius": 2.5, "fov": 60},
        ], "n_frames": 5}
    )
    p = tmp_path / "camera_path.json"
    p.write_text(json.dumps(spec))

    # interpolate exactly as cmd_camera_path does
    from nerf_emitter_tpu.scripts.render import _slerp

    keys = spec["keyframes"]
    kf = [np.asarray(k["c2w"], np.float32) for k in keys]
    n = spec["n_frames"]
    for i in range(n):
        u = i / (n - 1) * (len(keys) - 1)
        a = min(int(u), len(keys) - 2)
        t = u - a
        rot = _slerp(kf[a][:, :3], kf[a + 1][:, :3], t)
        # valid rotation throughout the path
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)
    # endpoints are the keyframes themselves
    np.testing.assert_allclose(
        _slerp(kf[0][:, :3], kf[1][:, :3], 0.0), kf[0][:, :3], atol=1e-5
    )
    np.testing.assert_allclose(
        _slerp(kf[0][:, :3], kf[1][:, :3], 1.0), kf[1][:, :3], atol=1e-5
    )


def test_viewer_scene_tree_and_training_control(tmp_path):
    """New round-5 parity surfaces (reference viser viewer: scene graph +
    train toggle): /scene serves cameras/aabb/lights from the live
    scene_fn, /control pause/resume/stop flips the flags the Trainer
    polls, and /metrics carries phase + paused for the client."""
    c2w = np.eye(4, dtype=np.float32)[:3].tolist()

    def scene_fn():
        return {
            "phase": "sdf",
            "cameras": [c2w],
            "aabb": [[-1, -1, -1], [1, 1, 1]],
            "lights": {"positions": [[0, 2, 0]], "weights": [1.0]},
        }

    state = ViewerState(_fake_render, save_dir=tmp_path, scene_fn=scene_fn)
    state.phase = "sdf"
    server = start_viewer(state, port=0)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        scene = json.loads(
            urllib.request.urlopen(base + "/scene", timeout=10).read()
        )
        assert scene["phase"] == "sdf"
        assert np.asarray(scene["cameras"]).shape == (1, 3, 4)
        assert scene["lights"]["positions"] == [[0, 2, 0]]

        def control(action):
            req = urllib.request.Request(
                base + "/control",
                data=json.dumps({"action": action}).encode(),
                method="POST",
            )
            return json.loads(urllib.request.urlopen(req, timeout=10).read())

        assert control("pause") == {"paused": True, "stop": False}
        assert state.paused is True
        m = json.loads(
            urllib.request.urlopen(base + "/metrics", timeout=10).read()
        )
        assert m["paused"] is True and m["phase"] == "sdf"
        assert control("resume") == {"paused": False, "stop": False}
        assert control("stop") == {"paused": False, "stop": True}
        assert state.stop_requested is True

        # unknown actions 400 instead of silently no-opping
        req = urllib.request.Request(
            base + "/control",
            data=json.dumps({"action": "bogus"}).encode(),
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # the page embeds the scene tree + control UI
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        for needle in (b"scene", b"pause training", b"camlist", b"showaabb"):
            assert needle in page
    finally:
        server.shutdown()
