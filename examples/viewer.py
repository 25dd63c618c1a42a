#!/usr/bin/env python
"""Live progressive viewer (reference examples/gui + nanosg viewer
architecture, gui/main.cc:106-180): a render thread accumulates AO
passes under the cancel/refresh contract while a *live* UI shows them.

Two surfaces replace the reference's ImGui window:

* terminal (default): the accumulating image renders in-place as ANSI
  truecolor half-blocks, refreshing every ~0.3 s; mid-run the camera
  orbits (RequestRender -> accumulation restarts), demonstrating the
  refresh/cancel contract live.
* --http [PORT]: a tiny stdlib HTTP page at localhost:PORT with the
  accumulating PNG, pass counter, and Orbit / Restart / Quit buttons
  wired to the same contract (rtcCommit-style edits would hook in the
  same way).

Usage:
  python examples/viewer.py [seconds] [camera_type]
  python examples/viewer.py --http 8000 [seconds]
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax.numpy as jnp

import nanort_tpu as nrt
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_cornell_box, make_uv_sphere, merge_meshes
from nanort_tpu.models.cameras import generate_rays, look_at
from nanort_tpu.models.objrender import render_ao
from nanort_tpu.models.progressive import ProgressiveRenderer
from nanort_tpu.utils.image import encode_png, save_png, to_u8


SIZE = 128


def build_scene():
    import jax

    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(24, 48, 0.5))
    mesh = nrt.TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    opts = nrt.BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    bvh, _ = nrt.build_triangle_bvh(mesh, opts)
    if jax.default_backend() == "cpu":
        return bvh, mesh, None  # packet kernel is TPU-only
    s8 = collapse_bvh8(bvh, v, f)
    s8 = s8._replace(nodes=jnp.asarray(s8.nodes), leafs=jnp.asarray(s8.leafs))
    return bvh, mesh, s8


def make_render_pass(bvh, mesh, s8, state, cam_type="perspective"):
    def render_pass(p, key):
        az = state["azimuth"]
        el = state.get("elevation", 0.0)
        ce = np.cos(el)
        eye = (2.4 * ce * np.sin(az), 2.4 * np.sin(el),
               2.4 * ce * np.cos(az))
        cam = look_at(eye=eye, center=(0, 0, 0), width=SIZE, height=SIZE,
                      fov=60)
        rays = generate_rays(cam, cam_type)
        aovs, _ = render_ao(bvh, mesh, rays, key, n_samples=2, max_leaf=8,
                            scene8=s8)
        return {"rgb": np.asarray(aovs["rgb"])}

    return render_pass


def ansi_frame(rgb, status):
    """Render the image as truecolor half-blocks, two pixels per cell."""
    u8 = to_u8(np.clip(rgb, 0, 1), gamma=2.2)
    h, w, _ = u8.shape
    step = max(1, w // 64)
    rows = []
    for y in range(0, h - step, 2 * step):
        cells = []
        for x in range(0, w, step):
            t = u8[y, x]
            b = u8[y + step, x]
            cells.append(
                f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m"
                f"\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
            )
        rows.append("".join(cells) + "\x1b[0m")
    return "\n".join(rows) + f"\n\x1b[0m{status}\n"


def run_terminal(seconds, cam_type):
    bvh, mesh, s8 = build_scene()
    state = {"azimuth": 0.0}
    r = ProgressiveRenderer(
        make_render_pass(bvh, mesh, s8, state, cam_type), max_passes=128
    ).start()
    t0 = time.perf_counter()
    orbited = False
    interactive = sys.stdout.isatty()
    while time.perf_counter() - t0 < seconds:
        time.sleep(0.3)
        if not orbited and time.perf_counter() - t0 > seconds / 2:
            # live scene edit mid-run: orbit the camera and restart
            # accumulation (the reference's RequestRender contract)
            state["azimuth"] = 0.6
            r.request_render()
            orbited = True
        snap = r.snapshot()
        status = (
            f"pass {r.passes_done}/128"
            + ("  [orbited: accumulation restarted]" if orbited else "")
        )
        if snap:
            frame = ansi_frame(snap["rgb"], status)
            if interactive:
                sys.stdout.write("\x1b[H\x1b[2J" + frame)
            else:
                sys.stdout.write(status + "\n")
            sys.stdout.flush()
    snap = r.snapshot()
    r.quit()
    if snap:
        if interactive:
            sys.stdout.write("\x1b[H\x1b[2J" + ansi_frame(snap["rgb"], ""))
        save_png("viewer.png", np.clip(snap["rgb"], 0, 1))
        print(f"wrote viewer.png after {r.passes_done} passes")


PAGE = b"""<!doctype html><title>nanort_tpu viewer</title>
<body style="background:#111;color:#eee;font-family:monospace">
<h3>nanort_tpu progressive viewer</h3>
<img id=f width=512 height=512 draggable=false
     style="image-rendering:pixelated;cursor:grab;touch-action:none">
<div id=s></div>
<button onclick="fetch('/orbit',{method:'POST'})">Orbit</button>
<button onclick="fetch('/restart',{method:'POST'})">Restart</button>
<button onclick="fetch('/quit',{method:'POST'})">Quit</button>
<div>drag the image to orbit (trackball: accumulation restarts live)</div>
<script>
async function tick(){
  document.getElementById('f').src='/frame.png?'+Date.now();
  const st=await (await fetch('/status')).json();
  document.getElementById('s').textContent=
    'pass '+st.passes+'/'+st.max+'  azimuth '+st.azimuth.toFixed(2)+
    '  elevation '+st.elevation.toFixed(2);
}
setInterval(tick, 500); tick();
// drag-to-orbit gizmo: pointer deltas post to /drag, throttled; the
// render thread restarts accumulation per the cancel contract
const img=document.getElementById('f');
let down=false,lx=0,ly=0,ax=0,ay=0,timer=null;
img.addEventListener('pointerdown',e=>{down=true;lx=e.clientX;ly=e.clientY;
  img.setPointerCapture(e.pointerId);});
img.addEventListener('pointerup',()=>{down=false;});
img.addEventListener('pointermove',e=>{
  if(!down)return;
  ax+=e.clientX-lx; ay+=e.clientY-ly; lx=e.clientX; ly=e.clientY;
  if(!timer)timer=setTimeout(()=>{
    fetch('/drag',{method:'POST',body:JSON.stringify({dx:ax,dy:ay})});
    ax=0;ay=0;timer=null;},100);
});
</script>"""


def run_http(port, seconds):
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    bvh, mesh, s8 = build_scene()
    state = {"azimuth": 0.0, "elevation": 0.0}
    r = ProgressiveRenderer(
        make_render_pass(bvh, mesh, s8, state), max_passes=128
    ).start()

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/frame.png"):
                snap = r.snapshot()
                img = snap.get("rgb") if snap else None
                if img is None:
                    img = np.zeros((SIZE, SIZE, 3), np.float32)
                self._send(200, "image/png",
                           encode_png(np.clip(img, 0, 1)))
            elif self.path.startswith("/status"):
                body = json.dumps({
                    "passes": r.passes_done, "max": r.max_passes,
                    "azimuth": state["azimuth"],
                    "elevation": state.get("elevation", 0.0),
                }).encode()
                self._send(200, "application/json", body)
            else:
                self._send(200, "text/html", PAGE)

        def do_POST(self):
            if self.path == "/drag":
                n = int(self.headers.get("Content-Length", 0))
                try:
                    d = json.loads(self.rfile.read(n) or b"{}")
                    state["azimuth"] += 0.01 * float(d.get("dx", 0))
                    state["elevation"] = float(np.clip(
                        state.get("elevation", 0.0)
                        + 0.01 * float(d.get("dy", 0)), -1.4, 1.4))
                    r.request_render()
                except (ValueError, TypeError):
                    pass
            elif self.path == "/orbit":
                state["azimuth"] += 0.3
                r.request_render()
            elif self.path == "/restart":
                r.request_render()
            elif self.path == "/quit":
                r.quit()
            self._send(200, "text/plain", b"ok")

    srv = ThreadingHTTPServer(("127.0.0.1", port), H)
    print(f"viewer at http://127.0.0.1:{port}/ ({seconds:.0f}s)")
    srv.timeout = 0.5
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        srv.handle_request()
    r.quit()
    snap = r.snapshot()
    if snap:
        save_png("viewer.png", np.clip(snap["rgb"], 0, 1))
        print(f"wrote viewer.png after {r.passes_done} passes")


def main():
    args = sys.argv[1:]
    if args and args[0] == "--http":
        port = int(args[1]) if len(args) > 1 else 8000
        seconds = float(args[2]) if len(args) > 2 else 30.0
        run_http(port, seconds)
        return
    seconds = float(args[0]) if args else 5.0
    cam_type = args[1] if len(args) > 1 else "perspective"
    run_terminal(seconds, cam_type)


if __name__ == "__main__":
    main()
