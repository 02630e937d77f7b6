"""Viewer server roundtrip test."""

import urllib.request

import numpy as np

from nerf_emitter_tpu.viewer.server import ViewerState, start_viewer


def test_viewer_serves_page_and_render():
    def fake_render(theta, phi, radius, w, h):
        img = np.zeros((h, w, 3), np.float32)
        img[..., 0] = 0.5
        return img

    state = ViewerState(fake_render)
    server = start_viewer(state, port=0)  # ephemeral port
    port = server.server_address[1]
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ).read()
        assert b"viewer" in page

        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?theta=0&phi=0&w=16&h=16",
            timeout=30,
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        import json

        status = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/status", timeout=10
            ).read()
        )
        assert status["step"] == 0
    finally:
        server.shutdown()
