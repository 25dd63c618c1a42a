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
  accumulating PNG, pass counter, Orbit / Restart / Quit buttons, AND a
  per-node gizmo (reference nanosg/main.cc ImGuizmo): pick a scene-graph
  node, nudge it along x/y/z — the edit recomposes the node transform,
  re-commits the scene (cached mesh BVHs: no rebuild, nanosg.h:409-443)
  and restarts accumulation under the same cancel contract.

Usage:
  python examples/viewer.py [seconds] [camera_type]
  python examples/viewer.py --http 8000 [seconds]
"""
import os
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


def build_scene_graph():
    """Named-node scene for the gizmo viewer: a cornell shell plus two
    movable spheres (reference nanosg obj scenes are also multi-node)."""
    from nanort_tpu.scene.graph import Node, Scene

    bv, bf = make_cornell_box(2.0)
    sv, sf = make_uv_sphere(20, 40, 0.45)
    sc = Scene()
    sc.add_node(Node("box", nrt.TriangleMesh(
        vertices=jnp.asarray(bv), faces=jnp.asarray(bf))))
    ball = nrt.TriangleMesh(vertices=jnp.asarray(sv), faces=jnp.asarray(sf))
    from nanort_tpu.scene import matrix as mat

    sc.add_node(Node("ball_a", ball, mat.translate((-0.7, -0.6, 0.0))))
    sc.add_node(Node("ball_b", ball, mat.translate((0.7, -0.6, 0.5))))
    sc.commit()
    return sc


def make_render_pass_sg(scene, state, cam_type="perspective"):
    """Scene-graph render pass: headlight + 2-sample AO, all through
    Scene.traverse so node edits (re-commits) take effect live."""
    import jax
    from nanort_tpu.scene.graph import scene_traverse

    tint = np.array([[0.9, 0.9, 0.95], [0.95, 0.5, 0.4],
                     [0.4, 0.6, 0.95], [0.8, 0.8, 0.4]], np.float32)

    def render_pass(p, key):
        cs = state["cs"]
        az = state["azimuth"]
        el = state.get("elevation", 0.0)
        ce = np.cos(el)
        eye = (3.4 * ce * np.sin(az), 3.4 * np.sin(el),
               3.4 * ce * np.cos(az))
        cam = look_at(eye=eye, center=(0, 0, 0), width=SIZE, height=SIZE,
                      fov=60)
        rays = generate_rays(cam, cam_type)
        h = scene_traverse(cs, rays)
        n = np.asarray(h.normal_s).reshape(-1, 3)
        d = np.asarray(rays.dir).reshape(-1, 3)
        hit = np.asarray(h.hit).reshape(-1)
        shade = np.abs((n * -d).sum(-1)) * 0.6 + 0.25
        # 2 AO samples per pass: offset along the normal, random
        # hemisphere dir, occluded when anything lies within 1.2 units
        pos = np.asarray(h.position).reshape(-1, 3) + 1e-3 * n
        kk = np.asarray(jax.random.uniform(key, (2, n.shape[0], 3))) - 0.5
        ao = np.zeros(n.shape[0], np.float32)
        for s in range(2):
            w = kk[s] + n * (np.abs(kk[s]).sum(-1, keepdims=True) + 1e-3)
            w /= np.linalg.norm(w, axis=-1, keepdims=True) + 1e-20
            sh = scene_traverse(cs, nrt.make_rays(
                pos, w.astype(np.float32),
                max_t=np.where(hit, 1.2, -1.0).astype(np.float32)))
            ao += 1.0 - np.asarray(sh.hit).reshape(-1).astype(np.float32)
        nid = np.minimum(np.asarray(h.node_id).reshape(-1), len(tint) - 1)
        rgb = (shade * (0.35 + 0.65 * ao / 2))[:, None] * tint[nid]
        rgb = np.where(hit[:, None], rgb, 0.05)
        return {"rgb": rgb.reshape(SIZE, SIZE, 3)}

    return render_pass


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
<div style="margin-top:6px">
node gizmo: <select id=node></select>
<span id=moves></span>
<div>drag the image to orbit; node moves re-commit the scene live</div>
</div>
<script>
async function loadNodes(){
  const ns=await (await fetch('/nodes')).json();
  const sel=document.getElementById('node');
  sel.innerHTML=ns.map(n=>'<option>'+n+'</option>').join('');
  const mv=document.getElementById('moves');
  const axes=[['x',1,0,0],['y',0,1,0],['z',0,0,1]];
  mv.innerHTML=axes.map(a=>
    '<button onclick="moveNode('+a[1]+','+a[2]+','+a[3]+')">+'+a[0]+
    '</button><button onclick="moveNode('+(-a[1])+','+(-a[2])+','+
    (-a[3])+')">-'+a[0]+'</button>').join('');
}
function moveNode(x,y,z){
  const name=document.getElementById('node').value;
  fetch('/node',{method:'POST',body:JSON.stringify(
    {name:name,dx:0.25*x,dy:0.25*y,dz:0.25*z})});
}
loadNodes();
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

    sc = build_scene_graph()
    node_names = ["box", "ball_a", "ball_b"]
    state = {"azimuth": 0.0, "elevation": 0.0, "cs": sc.committed}
    r = ProgressiveRenderer(
        make_render_pass_sg(sc, state), max_passes=128
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
            elif self.path.startswith("/nodes"):
                self._send(200, "application/json",
                           json.dumps(node_names).encode())
            else:
                self._send(200, "text/html", PAGE)

        def do_POST(self):
            if self.path == "/node":
                # the gizmo edit path: translate a named node, re-commit
                # (cached BVHs — matrices only), restart accumulation
                n = int(self.headers.get("Content-Length", 0))
                try:
                    d = json.loads(self.rfile.read(n) or b"{}")
                    node = sc.find_node(str(d.get("name", "")))
                    if node is not None and node.mesh is not None:
                        node.translate(float(d.get("dx", 0)),
                                       float(d.get("dy", 0)),
                                       float(d.get("dz", 0)))
                        state["cs"] = sc.commit()
                        r.request_render()
                except (ValueError, TypeError):
                    pass
            elif self.path == "/drag":
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
    if os.environ.get("NANORT_VIEWER_CPU") == "1":
        # the axon sitecustomize overrides JAX_PLATFORMS; config wins
        import jax

        jax.config.update("jax_platforms", "cpu")
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
