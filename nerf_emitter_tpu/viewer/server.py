"""Web viewer: interactive scene inspection beside (or after) training.

Re-design of the reference's viser-based viewer (nerfstudio/viewer/, 3557
LoC + viewer_beta 1466) as a dependency-free HTTP server + single-page
client. Feature parity with the parts of the reference viewer the paper
workflow actually uses:

- orbit / pan (shift-drag) / zoom / FOV camera control
- render modes: rgb | depth | accumulation | normal (the reference's
  output_render selector)
- quality controls: spp + resolution, with low-res progressive refresh
  while dragging
- live training status + loss sparkline (/metrics, fed by the Trainer)
- live training CONTROL: pause / resume / stop buttons (the reference
  viewer's train-toggle, viewer/viewer_elements.py + control_panel);
  the Trainer polls the flags each iteration and stops with a checkpoint
- scene tree (the reference's viser scene graph): training-camera
  frustums, the object AABB wireframe, and the fitted light clusters
  (GMM means, world space) drawn as overlays; click a camera row to jump
  the viewpoint to that training camera's pose
- keyframe capture -> camera-path JSON export, rendered offline by
  `scripts/render.py camera-path --camera-path-file` (the reference's
  viewer camera-path workflow, render.py:808-818)
- light-rotation slider: relighting preview by rotating the emitter
  around the object (reference set_light_axis_angle,
  mitsuba_sdf.py:1230-1233) once takeover state exists

GET /render?theta=&phi=&radius=&tx=&ty=&tz=&fov=&spp=&mode=&light=&w=&h=
returns a tonemapped PNG rendered from the live pipeline.
"""

from __future__ import annotations

import io
import json
import threading
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html><html><head><title>nerf_emitter_tpu viewer</title>
<style>
body{margin:0;background:#111;color:#eee;font-family:sans-serif;display:flex}
#wrap{position:relative;width:512px;height:512px}
#c{cursor:grab;image-rendering:pixelated;position:absolute;left:0;top:0}
#ov{position:absolute;left:0;top:0;pointer-events:none}
#panel{padding:10px;min-width:250px;font-size:13px;max-height:100vh;overflow-y:auto}
#panel label{display:block;margin-top:8px}
#spark{background:#181818;display:block;margin-top:4px}
button{margin-top:6px}
select,input[type=range]{width:100%}
#tree{margin-top:10px;border-top:1px solid #333;padding-top:6px}
#tree .node{margin-left:10px}
#camlist{max-height:130px;overflow-y:auto;margin-left:22px;color:#9cf}
#camlist div{cursor:pointer}
#camlist div:hover{color:#fff}
.phase{color:#fc6}
</style></head><body>
<div id=wrap>
  <img id=c width=512 height=512>
  <canvas id=ov width=512 height=512></canvas>
</div>
<div id=panel>
  <div>step <span id=step>-</span> &middot; loss <span id=loss>-</span>
    &middot; <span id=phase class=phase>-</span></div>
  <canvas id=spark width=210 height=48></canvas>
  <div>
    <button id=pause>pause training</button>
    <button id=stop>stop + checkpoint</button>
  </div>
  <label>mode <select id=mode>
    <option>rgb</option><option>depth</option>
    <option>accumulation</option><option>normal</option></select></label>
  <label>spp <span id=sppv>4</span>
    <input id=spp type=range min=1 max=32 value=4></label>
  <label>resolution <span id=resv>256</span>
    <input id=res type=range min=64 max=512 step=64 value=256></label>
  <label>fov&deg; <span id=fovv>40</span>
    <input id=fov type=range min=15 max=90 value=40></label>
  <label>light rotation&deg; <span id=lightv>0</span>
    <input id=light type=range min=0 max=360 value=0></label>
  <button id=key>add keyframe (<span id=nkey>0</span>)</button>
  <button id=exp>export camera path</button>
  <div id=tree><b>scene</b>
    <div class=node><label><input type=checkbox id=showcams>
      cameras (<span id=ncams>0</span>) — click to jump</label>
      <div id=camlist></div></div>
    <div class=node><label><input type=checkbox id=showaabb>
      object AABB</label></div>
    <div class=node><label><input type=checkbox id=showlights>
      light clusters (<span id=nlights>0</span>)</label></div>
  </div>
  <div style="margin-top:10px;color:#888">drag orbit &middot; shift-drag pan
  &middot; wheel zoom</div>
</div>
<script>
let th=0.5, ph=0.4, r=2.4, t=[0,0,0], busy=false, drag=false, dirty=true;
let scene=null, paused=false;
const $=id=>document.getElementById(id);
const img=$('c');
const keys=[];
function params(w){
  return `theta=${th}&phi=${ph}&radius=${r}&tx=${t[0]}&ty=${t[1]}&tz=${t[2]}`+
    `&fov=${$('fov').value}&spp=${drag?1:$('spp').value}`+
    `&mode=${$('mode').value}&light=${$('light').value}&w=${w}&h=${w}`;
}
function load(){ if(busy||!dirty) return; busy=true; dirty=false;
  const w = drag ? 128 : +$('res').value;
  const u=`/render?`+params(w);
  const i=new Image();
  i.onload=()=>{img.src=u; busy=false; overlay(); if(dirty) load();};
  i.onerror=()=>{busy=false;};
  i.src=u; }
function mark(){ dirty=true; overlay(); load(); }
// ---- scene-tree overlays: project world points through the SAME
// look-at/pinhole model the server renders with (data/synthetic.look_at:
// forward=target-eye, right=fwd x up, up'=right x fwd; u=W/2+f*x/z).
function basis(){
  const eye=[t[0]+r*Math.cos(th)*Math.cos(ph), t[1]+r*Math.sin(ph),
             t[2]+r*Math.sin(th)*Math.cos(ph)];
  let f=[t[0]-eye[0],t[1]-eye[1],t[2]-eye[2]];
  const nf=Math.hypot(...f); f=f.map(v=>v/nf);
  // right = fwd x up with up=(0,1,0) => (-fz, 0, fx)
  let rg=[-f[2],0,f[0]];
  const nr=Math.hypot(...rg)||1; rg=rg.map(v=>v/nr);
  const up=[rg[1]*f[2]-rg[2]*f[1], rg[2]*f[0]-rg[0]*f[2],
            rg[0]*f[1]-rg[1]*f[0]]; // right x fwd
  return {eye,f,rg,up};
}
function project(p,B,W){
  const d=[p[0]-B.eye[0],p[1]-B.eye[1],p[2]-B.eye[2]];
  const z=d[0]*B.f[0]+d[1]*B.f[1]+d[2]*B.f[2];
  if(z<=1e-6) return null;
  const fpx=0.5*W/Math.tan((+$('fov').value)*Math.PI/360);
  const x=d[0]*B.rg[0]+d[1]*B.rg[1]+d[2]*B.rg[2];
  const y=d[0]*B.up[0]+d[1]*B.up[1]+d[2]*B.up[2];
  return [W/2+fpx*x/z, W/2-fpx*y/z];
}
function seg(c,B,W,a,b){const pa=project(a,B,W),pb=project(b,B,W);
  if(pa&&pb){c.beginPath();c.moveTo(pa[0],pa[1]);c.lineTo(pb[0],pb[1]);c.stroke();}}
function overlay(){
  const cv=$('ov'), c=cv.getContext('2d'), W=512;
  c.clearRect(0,0,W,W);
  if(!scene) return;
  const B=basis();
  if($('showcams').checked && scene.cameras){
    c.strokeStyle='#5d5';c.lineWidth=1;
    for(const m of scene.cameras){ // m = 3x4 c2w (OpenGL: -z forward)
      const o=[m[0][3],m[1][3],m[2][3]];
      const s=0.12*r;
      const fw=[-m[0][2],-m[1][2],-m[2][2]],
            rt=[m[0][0],m[1][0],m[2][0]], upv=[m[0][1],m[1][1],m[2][1]];
      const corners=[];
      for(const [sx,sy] of [[-1,-1],[1,-1],[1,1],[-1,1]])
        corners.push([0,1,2].map(i=>o[i]+s*(fw[i]+0.5*sx*rt[i]+0.5*sy*upv[i])));
      for(let i=0;i<4;i++){ seg(c,B,W,o,corners[i]);
        seg(c,B,W,corners[i],corners[(i+1)%4]); }
    }
  }
  if($('showaabb').checked && scene.aabb){
    c.strokeStyle='#fa4';c.lineWidth=1;
    const [lo,hi]=scene.aabb;
    const v=[[lo[0],lo[1],lo[2]],[hi[0],lo[1],lo[2]],[hi[0],hi[1],lo[2]],
             [lo[0],hi[1],lo[2]],[lo[0],lo[1],hi[2]],[hi[0],lo[1],hi[2]],
             [hi[0],hi[1],hi[2]],[lo[0],hi[1],hi[2]]];
    for(const [a,b] of [[0,1],[1,2],[2,3],[3,0],[4,5],[5,6],[6,7],[7,4],
                        [0,4],[1,5],[2,6],[3,7]]) seg(c,B,W,v[a],v[b]);
  }
  if($('showlights').checked && scene.lights){
    const ws=scene.lights.weights, mx=Math.max(...ws,1e-9);
    c.fillStyle='#ff6';
    scene.lights.positions.forEach((p,i)=>{
      const q=project(p,B,512); if(!q) return;
      const rad=2+6*Math.sqrt(ws[i]/mx);
      c.beginPath();c.arc(q[0],q[1],rad,0,6.3);c.fill();});
  }
}
async function loadScene(){
  try{ scene=await (await fetch('/scene')).json(); }catch(e){ return; }
  $('ncams').innerText=(scene.cameras||[]).length;
  $('nlights').innerText=scene.lights?scene.lights.positions.length:0;
  $('phase').innerText=scene.phase||'-';
  const cl=$('camlist'); cl.innerHTML='';
  (scene.cameras||[]).forEach((m,i)=>{
    const d=document.createElement('div'); d.textContent='cam '+i;
    d.onclick=()=>{ // jump to this camera's pose: eye=c2w[:,3], look -z
      const eye=[m[0][3],m[1][3],m[2][3]];
      const fw=[-m[0][2],-m[1][2],-m[2][2]];
      r=Math.hypot(eye[0]-t[0],eye[1]-t[1],eye[2]-t[2]);
      t=[eye[0]+fw[0]*r, eye[1]+fw[1]*r, eye[2]+fw[2]*r];
      const o=[eye[0]-t[0],eye[1]-t[1],eye[2]-t[2]];
      ph=Math.asin(Math.max(-1,Math.min(1,o[1]/r)));
      th=Math.atan2(o[2],o[0]); mark(); };
    cl.appendChild(d); });
  overlay();
}
for(const id of ['showcams','showaabb','showlights'])
  $(id).onchange=overlay;
$('pause').onclick=async()=>{
  paused=!paused;
  await fetch('/control',{method:'POST',
    body:JSON.stringify({action:paused?'pause':'resume'})});
  $('pause').innerText=paused?'resume training':'pause training'; };
$('stop').onclick=async()=>{
  if(!confirm('stop training and write a checkpoint?')) return;
  await fetch('/control',{method:'POST',
    body:JSON.stringify({action:'stop'})}); };
let lx=0,ly=0,pan=false;
img.onmousedown=e=>{drag=true;pan=e.shiftKey;lx=e.x;ly=e.y};
window.onmouseup=()=>{if(drag){drag=false;mark();}};
window.onmousemove=e=>{if(!drag)return;
  const dx=e.x-lx, dy=e.y-ly; lx=e.x; ly=e.y;
  if(pan){const s=r*0.002;
    t[0]-=s*(dx*Math.sin(th)); t[2]+=s*(dx*Math.cos(th)); t[1]+=s*dy;}
  else {th+=dx*0.01; ph+=dy*0.01; ph=Math.max(-1.4,Math.min(1.4,ph));}
  mark();};
window.onwheel=e=>{r*=e.deltaY>0?1.1:0.9; mark();};
for(const id of ['mode','spp','res','fov','light'])
  $(id).oninput=()=>{ $('sppv').innerText=$('spp').value;
    $('resv').innerText=$('res').value; $('fovv').innerText=$('fov').value;
    $('lightv').innerText=$('light').value; mark(); };
$('key').onclick=()=>{ keys.push({theta:th,phi:ph,radius:r,
  target:[...t],fov:+$('fov').value}); $('nkey').innerText=keys.length; };
$('exp').onclick=async()=>{
  const res=await fetch('/save_path',{method:'POST',
    body:JSON.stringify({keyframes:keys,n_frames:keys.length*24})});
  alert(await res.text()); };
let lastPhase=null;
async function poll(){
  try{
    const m=await (await fetch('/metrics')).json();
    $('step').innerText=m.step;
    if(m.phase!==lastPhase){ lastPhase=m.phase; loadScene(); }
    if(m.losses.length){ $('loss').innerText=m.losses.at(-1)[1].toFixed(4);
      const c=$('spark').getContext('2d'); c.clearRect(0,0,210,48);
      const vs=m.losses.map(p=>p[1]);
      const lo=Math.min(...vs), hi=Math.max(...vs)+1e-12;
      c.strokeStyle='#6cf'; c.beginPath();
      vs.forEach((v,i)=>{const x=i/(vs.length-1||1)*208+1,
        y=46-(v-lo)/(hi-lo)*44; i?c.lineTo(x,y):c.moveTo(x,y);});
      c.stroke(); }
  }catch(e){}
  setTimeout(poll, 2000); }
mark(); loadScene(); poll(); setInterval(()=>{dirty=true;load();}, 5000);
</script></body></html>"""

MODES = ("rgb", "depth", "accumulation", "normal")


class ViewerState:
    """Mutable handle the trainer updates; the server reads it."""

    def __init__(self, render_fn, scene_radius: float = 2.4,
                 save_dir: Optional[Path] = None, scene_fn=None):
        # render_fn(theta, phi, radius, w, h, target, fov_deg, spp, mode,
        #           light_angle) -> (h, w, 3) float radiance/visualization
        self.render_fn = render_fn
        self.scene_radius = scene_radius
        self.step = 0
        self.losses: deque = deque(maxlen=200)  # (step, loss)
        self.save_dir = Path(save_dir) if save_dir else Path(".")
        # scene_fn() -> {"cameras": [3x4 c2w...], "aabb": [lo, hi],
        #   "lights": {"positions": [...], "weights": [...]}, "phase": str}
        # for the scene-tree overlays; read live so the light clusters
        # appear the moment takeover fits them
        self.scene_fn = scene_fn
        self.phase = None  # "nerf" | "sdf", set cheaply by the trainer
        # live training control (the trainer polls these each iteration)
        self.paused = False
        self.stop_requested = False

    def put_metrics(self, step: int, metrics: dict) -> None:
        self.step = step
        loss = metrics.get("loss")
        if loss is not None and np.isfinite(loss):
            self.losses.append((int(step), float(loss)))

    def control(self, action: str) -> dict:
        if action == "pause":
            self.paused = True
        elif action == "resume":
            self.paused = False
        elif action == "stop":
            self.stop_requested = True
            self.paused = False
        else:
            raise ValueError(f"unknown control action {action!r}")
        return {"paused": self.paused, "stop": self.stop_requested}


def keyframes_to_camera_path(payload: dict) -> dict:
    """Viewer keyframes -> the camera-path JSON consumed by
    `scripts/render.py camera-path --camera-path-file` ({"keyframes":
    [{"c2w": 3x4, "fov_deg": f}], "n_frames": N})."""
    from ..data.synthetic import look_at

    out = []
    for k in payload.get("keyframes", []):
        th, ph, r = k["theta"], k["phi"], k["radius"]
        target = np.asarray(k.get("target", (0, 0, 0)), np.float32)
        eye = target + r * np.array(
            [np.cos(th) * np.cos(ph), np.sin(ph), np.sin(th) * np.cos(ph)],
            np.float32,
        )
        c2w = look_at(eye, target)[:3]
        out.append({"c2w": np.asarray(c2w).tolist(),
                    "fov_deg": float(k.get("fov", 40.0))})
    return {"keyframes": out,
            "n_frames": int(payload.get("n_frames", max(1, len(out)) * 24))}


def _make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence request spam
            pass

        def _send(self, body: bytes, ctype: str, code: int = 200):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            url = urlparse(self.path)
            if url.path == "/save_path":
                n = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    path_json = keyframes_to_camera_path(payload)
                    if not path_json["keyframes"]:
                        self._send(b"no keyframes set", "text/plain", 400)
                        return
                    out = state.save_dir / "camera_path.json"
                    out.parent.mkdir(parents=True, exist_ok=True)
                    out.write_text(json.dumps(path_json, indent=1))
                    msg = (
                        f"wrote {out} — render with:\n"
                        "python -m nerf_emitter_tpu.scripts.render camera-path "
                        f"--camera-path-file {out} --load-config <run>/config.json"
                    )
                    self._send(msg.encode(), "text/plain")
                except Exception as e:
                    self._send(str(e).encode(), "text/plain", 500)
                return
            if url.path == "/control":
                n = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    out = state.control(payload.get("action", ""))
                    self._send(json.dumps(out).encode(), "application/json")
                except Exception as e:
                    self._send(str(e).encode(), "text/plain", 400)
                return
            self._send(b"not found", "text/plain", 404)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._send(_PAGE.encode(), "text/html")
                return
            if url.path == "/status":
                self._send(
                    json.dumps({"step": state.step}).encode(),
                    "application/json",
                )
                return
            if url.path == "/metrics":
                self._send(
                    json.dumps(
                        {
                            "step": state.step,
                            "losses": list(state.losses),
                            "phase": state.phase,
                            "paused": state.paused,
                        }
                    ).encode(),
                    "application/json",
                )
                return
            if url.path == "/scene":
                try:
                    info = state.scene_fn() if state.scene_fn else {}
                except Exception as e:
                    self._send(str(e).encode(), "text/plain", 500)
                    return
                self._send(json.dumps(info).encode(), "application/json")
                return
            if url.path == "/render":
                q = parse_qs(url.query)

                def f(name, default):
                    return float(q.get(name, [default])[0])

                theta, phi = f("theta", 0.5), f("phi", 0.4)
                radius = f("radius", state.scene_radius)
                target = (f("tx", 0.0), f("ty", 0.0), f("tz", 0.0))
                fov = f("fov", 40.0)
                spp = max(1, min(int(f("spp", 4)), 64))
                light = f("light", 0.0) * np.pi / 180.0
                mode = q.get("mode", ["rgb"])[0]
                if mode not in MODES:
                    mode = "rgb"
                w = min(int(f("w", 256)), 1024)
                h = min(int(f("h", 256)), 1024)
                try:
                    rgb = np.asarray(
                        state.render_fn(
                            theta, phi, radius, w, h, target=target,
                            fov_deg=fov, spp=spp, mode=mode,
                            light_angle=light,
                        )
                    )
                except Exception as e:  # render errors -> 500 with message
                    self._send(str(e).encode(), "text/plain", 500)
                    return
                from PIL import Image

                import jax.numpy as jnp

                from ..utils.math import linear_to_srgb

                if mode == "rgb":
                    vis = np.asarray(linear_to_srgb(jnp.asarray(rgb)))
                else:
                    vis = np.clip(rgb, 0.0, 1.0)
                buf = io.BytesIO()
                Image.fromarray((vis * 255).astype(np.uint8)).save(buf, "PNG")
                self._send(buf.getvalue(), "image/png")
                return
            self._send(b"not found", "text/plain", 404)

    return Handler


def start_viewer(state: ViewerState, port: int = 7007) -> ThreadingHTTPServer:
    """Start the viewer in a daemon thread; returns the server handle."""
    server = ThreadingHTTPServer(("0.0.0.0", port), _make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    print(f"viewer: http://localhost:{server.server_address[1]}")
    return server


def make_orbit_render_fn(pipeline, dataset, default_spp: int = 4):
    """Adapter from viewer camera parameters to the live pipeline.

    Renders through pipeline.render_camera_outputs (NeRF before takeover,
    SDF + emitter after) and visualizes the requested output. A non-zero
    light_angle rotates the NeRF emitter around +y about the object center
    for a relighting preview (reference set_light_axis_angle)."""
    import jax
    import jax.numpy as jnp

    from ..cameras.cameras import Cameras
    from ..data.datamanager import ImageDataset
    from ..data.synthetic import look_at

    def render(theta, phi, radius, w, h, target=(0.0, 0.0, 0.0),
               fov_deg=40.0, spp=None, mode="rgb", light_angle=0.0):
        spp = default_spp if spp is None else spp
        tgt = np.asarray(target, np.float32)
        eye = tgt + radius * np.array(
            [np.cos(theta) * np.cos(phi), np.sin(phi),
             np.sin(theta) * np.cos(phi)],
            np.float32,
        )
        c2w = look_at(eye, tgt)[:3]
        f = 0.5 * w / np.tan(np.deg2rad(fov_deg) / 2.0)
        cams = Cameras(
            camera_to_worlds=jnp.asarray(c2w[None]),
            fx=jnp.full((1,), f), fy=jnp.full((1,), f),
            cx=jnp.full((1,), w / 2), cy=jnp.full((1,), h / 2),
            width=w, height=h,
        )
        if light_angle != 0.0 and pipeline.sdf_state is not None:
            # relighting preview: SDF render with the emitter queries
            # rotated about the object center (scripts/render.py
            # rotate-light, reference mitsuba_sdf.py:1230-1233)
            from ..renderer.integrator import render_spp
            from ..renderer.sensors import camera_rays_in_render_space

            base = pipeline._emitter_fn_of(pipeline.nerf_state.params)
            c, s = np.cos(light_angle), np.sin(light_angle)
            rot = jnp.asarray(
                [[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], jnp.float32
            )
            center = jnp.asarray([0.5, 0.5, 0.5])

            def rotated(x, d):
                return base((x - center) @ rot.T + center, d @ rot.T)

            o, d = camera_rays_in_render_space(
                cams, jnp.int32(0), h, w, pipeline.config.scene_scale
            )
            out = render_spp(
                pipeline.sdf_state.scene, o, d, jax.random.PRNGKey(0), spp,
                emitter_fn=rotated, config=pipeline.render_config,
            )
            out = {
                "rgb": out["rgb"].reshape(h, w, 3),
                "depth": out["depth"].reshape(h, w, 1)
                if "depth" in out else None,
                "normal": out["normal"].reshape(h, w, 3)
                if "normal" in out else None,
                "accumulation": out["soft_mask"].reshape(h, w, 1),
            }
        else:
            ds = ImageDataset(
                cameras=cams, images=dataset.images[:1], is_hdr=True
            )
            out = pipeline.render_camera_outputs(
                ds, 0, jax.random.PRNGKey(0), spp=spp
            )
        if mode == "rgb" or out.get(mode) is None:
            return out["rgb"]
        v = np.asarray(out[mode])
        if mode == "depth":
            d = v[..., 0]
            lo, hi = np.percentile(d, 2), np.percentile(d, 98)
            v = ((d - lo) / max(hi - lo, 1e-6))[..., None]
            return np.repeat(np.clip(v, 0, 1), 3, axis=-1)
        if mode == "accumulation":
            return np.repeat(np.clip(v, 0, 1), 3, axis=-1)
        return 0.5 * (v + 1.0)  # normal

    return render
