"""Lightweight web viewer: orbit the scene in a browser.

Re-design of the reference's viser-based viewer (nerfstudio/viewer/,
3557 LoC + viewer_beta 1466): a dependency-free HTTP server that renders
on demand from the live pipeline (or a checkpoint) — GET /render?theta=
&phi=&radius=&w=&h= returns a tonemapped PNG; / serves a small orbit UI
(drag to rotate). Runs in a daemon thread beside training so the user can
watch optimization progress, which is the viewer's job in the reference.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html><html><head><title>nerf_emitter_tpu viewer</title>
<style>body{margin:0;background:#111;color:#eee;font-family:sans-serif}
#c{cursor:grab}#hud{position:fixed;top:8px;left:8px}</style></head><body>
<div id=hud>drag to orbit &middot; wheel to zoom</div>
<img id=c width=512 height=512>
<script>
let th=0.5, ph=0.4, r=2.4, busy=false;
const img=document.getElementById('c');
function load(){ if(busy) return; busy=true;
  const u=`/render?theta=${th}&phi=${ph}&radius=${r}&w=256&h=256`;
  const i=new Image(); i.onload=()=>{img.src=u; busy=false;}; i.src=u; }
let drag=false,lx=0,ly=0;
img.onmousedown=e=>{drag=true;lx=e.x;ly=e.y};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return; th+=(e.x-lx)*0.01; ph+=(e.y-ly)*0.01;
  ph=Math.max(-1.4,Math.min(1.4,ph)); lx=e.x; ly=e.y; load();};
window.onwheel=e=>{r*=e.deltaY>0?1.1:0.9; load();};
load(); setInterval(load, 3000);
</script></body></html>"""


class ViewerState:
    """Mutable handle the trainer updates; the server reads it."""

    def __init__(self, render_fn, scene_radius: float = 2.4):
        # render_fn(theta, phi, radius, w, h) -> (h, w, 3) float radiance
        self.render_fn = render_fn
        self.scene_radius = scene_radius
        self.step = 0


def _make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence request spam
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if url.path == "/status":
                body = json.dumps({"step": state.step}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
                return
            if url.path == "/render":
                q = parse_qs(url.query)
                theta = float(q.get("theta", [0.5])[0])
                phi = float(q.get("phi", [0.4])[0])
                radius = float(q.get("radius", [state.scene_radius])[0])
                w = min(int(q.get("w", [256])[0]), 1024)
                h = min(int(q.get("h", [256])[0]), 1024)
                try:
                    rgb = np.asarray(state.render_fn(theta, phi, radius, w, h))
                except Exception as e:  # render errors -> 500 with message
                    msg = str(e).encode()
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(msg)
                    return
                # tonemap to PNG
                from PIL import Image

                from ..utils.math import linear_to_srgb
                import jax.numpy as jnp

                srgb = np.asarray(linear_to_srgb(jnp.asarray(rgb)))
                buf = io.BytesIO()
                Image.fromarray((srgb * 255).astype(np.uint8)).save(buf, "PNG")
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(404)
            self.end_headers()

    return Handler


def start_viewer(state: ViewerState, port: int = 7007) -> ThreadingHTTPServer:
    """Start the viewer in a daemon thread; returns the server handle."""
    server = ThreadingHTTPServer(("0.0.0.0", port), _make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    print(f"viewer: http://localhost:{port}")
    return server


def make_orbit_render_fn(pipeline, dataset, spp: int = 4):
    """Adapter: (theta, phi, radius, w, h) -> rgb from the live pipeline."""
    import jax
    import jax.numpy as jnp

    from ..cameras.cameras import Cameras
    from ..data.datamanager import ImageDataset
    from ..data.synthetic import look_at

    def render(theta, phi, radius, w, h):
        eye = radius * np.array(
            [np.cos(theta) * np.cos(phi), np.sin(phi), np.sin(theta) * np.cos(phi)],
            np.float32,
        )
        c2w = look_at(eye, np.zeros(3))[:3]
        f = 0.5 * w / np.tan(0.35)
        cams = Cameras(
            camera_to_worlds=jnp.asarray(c2w[None]),
            fx=jnp.full((1,), f), fy=jnp.full((1,), f),
            cx=jnp.full((1,), w / 2), cy=jnp.full((1,), h / 2),
            width=w, height=h,
        )
        ds = ImageDataset(cameras=cams, images=dataset.images[:1], is_hdr=True)
        out = pipeline.render_camera_outputs(ds, 0, jax.random.PRNGKey(0), spp=spp)
        return out["rgb"]

    return render
