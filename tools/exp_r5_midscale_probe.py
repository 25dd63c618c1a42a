"""Midscale PT fault bisect, step 1: is the 100K-tri fused-BVH fault
launch-RUNTIME-proportional (TPU watchdog on one long kernel launch) or
intrinsic to the tree scale?

The pt_midscale matrix row (100K tris, 512^2 x 100 spp, mb=10, one
fused kernel launch) has crashed the TPU worker twice, the second time
process-isolated from a fresh interpreter (tools/logs/
matrix_r5_midscale.log) — so it is a property of the row, not ambient
state. Stack depth/leafq/VMEM sizing were audited green (r5 session
notes). The 974-face protocol scene runs the same kernel at 1.87 s
per launch without incident; this scene is ~100x the tris and the
bounce phase is incoherent, so one plausible mechanism is the
launch simply running long enough to trip the worker watchdog
(CLAUDE.md records watchdog kills for incoherent packet unions).

Probe ladder (each its own compile; all fresh-tree, same scene):
  spp=25  mb=10  — 1/4 the launch runtime of the faulting row
  spp=100 mb=2   — cheap bounces, ~1/4 runtime a different way
If BOTH are green, the fault is runtime-proportional: the row fix is
spp-chunked launches (4 x spp=25, averaged on host). If spp=25 also
faults, scale itself breaks the kernel and the bisect moves to tree
size (50K).
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from nanort_tpu.io.procedural import make_cornell_dense_pt_scene
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.models.path_tracer import make_pt_scene, render_path_traced

results = {}

sv, sf, mids, mats = make_cornell_dense_pt_scene(100_000)
pts = make_pt_scene(sv, sf, mids, mats, engine="pallas")
cam = look_at(eye=(0, 0.0, 2.6), center=(0, 0, 0),
              width=512, height=512, fov=45.0)
rays = pinhole_rays(cam)
key = jax.random.PRNGKey(3)

for tag, spp, mb in (("s25_b10", 25, 10), ("s100_b2", 100, 2)):
    try:
        t0 = time.perf_counter()
        img = render_path_traced(pts, rays, key, spp=spp, max_bounces=mb)
        mean = float(img.mean())
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        img = render_path_traced(pts, rays, key, spp=spp, max_bounces=mb)
        mean = float(img.mean())
        warm = time.perf_counter() - t0
        results[tag] = {"warm_s": round(warm, 3),
                        "first_incl_compile_s": round(first, 1),
                        "img_mean": round(mean, 5)}
    except Exception as e:
        results[tag] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(f"# {tag}: {results[tag]}", flush=True)
        print(json.dumps(results))
        sys.exit(1)  # worker likely down; let the queue sleep
    print(f"# {tag}: {results[tag]}", flush=True)

print(json.dumps(results))
with open("tools/logs/exp_r5_midscale_probe.json", "w") as fh:
    json.dump(results, fh, indent=1)
