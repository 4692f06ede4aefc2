"""Minimal web viewer — the framework's interactive frontend.

The reference's GUI is an ImGui/GLFW/OpenGL application wired into the
CUDA render loop (``src/testbed.cu:1003-2743``). A native window is the
wrong shape for a TPU host (usually a remote VM), so the TPU-native
frontend is a tiny HTTP server around ``Testbed.frame()``: the browser
polls ``/frame.jpg`` (each poll advances training by a chunk and renders
at the dynamic resolution) and posts orbit-camera updates. Single-
threaded on purpose — one JAX context, requests serialize.

Usage::

    python scripts/viewer.py data/nerf/fox --port 8080

Endpoints:
  GET  /            the HTML/JS client (canvas + mouse orbit + keys)
  GET  /frame.jpg   one heartbeat frame as JPEG (?w=&h=&train=0/1)
  GET  /state       JSON: step, loss, meters, camera
  POST /camera      JSON: {yaw, pitch, radius, fov} (partial ok)
"""

from __future__ import annotations

import io
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>ngp_tpu viewer</title><style>
body { margin:0; background:#111; color:#ccc; font:13px monospace; }
#hud { position:fixed; top:8px; left:8px; white-space:pre; }
canvas { display:block; margin:auto; image-rendering:pixelated; }
</style></head><body>
<div id="hud"></div><canvas id="c" width="512" height="512"></canvas>
<script>
let yaw=0, pitch=0.3, radius=1.6, fov=50, training=1, dragging=false, lx=0, ly=0;
const c=document.getElementById('c'), ctx=c.getContext('2d');
c.onmousedown=e=>{dragging=true;lx=e.clientX;ly=e.clientY;};
window.onmouseup=()=>dragging=false;
window.onmousemove=e=>{ if(!dragging) return;
  yaw+=(e.clientX-lx)*0.01; pitch+=(e.clientY-ly)*0.01;
  pitch=Math.max(-1.5,Math.min(1.5,pitch)); lx=e.clientX; ly=e.clientY;
  postCam(); };
window.onwheel=e=>{ radius*=Math.exp(e.deltaY*0.001); postCam(); };
window.onkeydown=e=>{ if(e.key==='t'){training^=1;} };
function postCam(){ fetch('/camera',{method:'POST',
  body:JSON.stringify({yaw:yaw,pitch:pitch,radius:radius,fov:fov})}); }
async function loop(){
  const img=new Image();
  img.onload=()=>{ ctx.drawImage(img,0,0,c.width,c.height); loop(); };
  img.onerror=()=>setTimeout(loop,500);
  img.src='/frame.jpg?train='+training+'&t='+Date.now();
  const s=await (await fetch('/state')).json();
  document.getElementById('hud').textContent=
    'step '+s.step+'  loss '+(s.loss||0).toFixed(5)+
    '  '+(s.frame_ms||0).toFixed(0)+' ms/frame  [t] train='+training;
}
loop();
</script></body></html>"""


class ViewerState:
    def __init__(self, center=(0.5, 0.5, 0.5), radius=1.6):
        self.yaw = 0.0
        self.pitch = 0.3
        self.radius = radius
        self.fov = 50.0
        self.center = np.asarray(center, np.float32)
        self.last = {}

    def xform(self) -> np.ndarray:
        """Orbit camera → (3, 4) camera-to-world (NGP convention: x right,
        y down, z forward, like the dataset loaders produce)."""
        cy, sy = math.cos(self.yaw), math.sin(self.yaw)
        cp, sp = math.cos(self.pitch), math.sin(self.pitch)
        eye = self.center + self.radius * np.asarray(
            [cy * cp, sy * cp, sp], np.float32
        )
        f = self.center - eye
        f /= np.linalg.norm(f)
        up = np.asarray([0.0, 0.0, 1.0], np.float32)
        r = np.cross(f, up)
        n = np.linalg.norm(r)
        r = r / n if n > 1e-6 else np.asarray([1.0, 0.0, 0.0], np.float32)
        d = np.cross(f, r)
        m = np.zeros((3, 4), np.float32)
        m[:, 0], m[:, 1], m[:, 2], m[:, 3] = r, d, f, eye
        return m


def make_server(testbed, host: str = "127.0.0.1", port: int = 8080,
                n_train_steps: int = 8) -> HTTPServer:
    """Build (not start) the HTTP server; ``serve_forever()`` to run, or
    use :func:`serve` for the blocking CLI path."""
    cam = ViewerState()
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            from urllib.parse import parse_qs, urlparse

            u = urlparse(self.path)
            if u.path == "/":
                self._send(200, _PAGE.encode(), "text/html")
                return
            if u.path == "/state":
                m = getattr(testbed.engine, "meters", None)
                fm = getattr(testbed, "_frame_meters", None)
                body = json.dumps({
                    "step": testbed.training_step,
                    "loss": None if testbed.loss != testbed.loss else testbed.loss,
                    "loss_ema": m.loss_ema if m else None,
                    "frame_ms": fm["frame_ms"].value if fm else None,
                    "camera": {"yaw": cam.yaw, "pitch": cam.pitch,
                               "radius": cam.radius, "fov": cam.fov},
                }).encode()
                self._send(200, body, "application/json")
                return
            if u.path == "/frame.jpg":
                q = parse_qs(u.query)
                w = int(q.get("w", ["512"])[0])
                h = int(q.get("h", ["512"])[0])
                train = q.get("train", ["1"])[0] == "1"
                with lock:
                    testbed.shall_train = train
                    out = testbed.frame(
                        width=w, height=h,
                        n_train_steps=n_train_steps if train else 0,
                        camera_matrix=cam.xform(), fov_deg=cam.fov,
                    )
                    cam.last = {
                        "resolution": out["resolution"],
                        "frame_ms": out["frame_ms"],
                    }
                img = np.asarray(out["image"])
                img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="JPEG", quality=90)
                self._send(200, buf.getvalue(), "image/jpeg")
                return
            self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path == "/camera":
                n = int(self.headers.get("Content-Length", "0"))
                upd = json.loads(self.rfile.read(n) or b"{}")
                for k in ("yaw", "pitch", "radius", "fov"):
                    if k in upd:
                        setattr(cam, k, float(upd[k]))
                self._send(200, b"{}", "application/json")
                return
            self._send(404, b"not found", "text/plain")

    srv = HTTPServer((host, port), Handler)
    srv.viewer_camera = cam  # exposed for tests/tools
    return srv


def serve(testbed, host: str = "127.0.0.1", port: int = 8080, **kw) -> None:
    srv = make_server(testbed, host, port, **kw)
    print(f"ngp_tpu viewer on http://{host}:{srv.server_address[1]}/")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
