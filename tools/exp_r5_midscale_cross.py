"""Midscale PT crossover: fused kernel vs XLA megabatch at 100K tris.

exp_r5_midscale_probe measured the fused BVH16 kernel at 100K tris:
31.5 s warm at spp=25 (-> ~126 s at the row's spp=100), and the worker
kills launches near the ~2-minute mark (both pt_midscale crashes died
~155 s in) — the fused path's win at 974 faces (1.87 s vs 43.5 s
megabatch) does NOT extrapolate: per-tile shared-stack unions blow up
on bounce rays when the tree is 100x bigger.

This probe times the OTHER route on the same scene/camera/spp so the
auto-route crossover is measured, not guessed:
  mega_100k   fused=False, spp=100, mb=10  — the per-bounce megabatch
              (sorted packets per bounce; its 43.5 s at 974 faces was
              sort/launch overhead, which does not scale with tris)
  fused_30k   spp=100 fused at a 30K-tri version of the scene —
              brackets the crossover from below (974 green, 100K red)
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
cam = look_at(eye=(0, 0.0, 2.6), center=(0, 0, 0),
              width=512, height=512, fov=45.0)
rays = pinhole_rays(cam)
key = jax.random.PRNGKey(3)


def bench(tag, n_tris, **kw):
    sv, sf, mids, mats = make_cornell_dense_pt_scene(n_tris)
    pts = make_pt_scene(sv, sf, mids, mats, engine="pallas")
    try:
        t0 = time.perf_counter()
        img = render_path_traced(pts, rays, key, spp=100, max_bounces=10,
                                 **kw)
        mean = float(img.mean())
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        img = render_path_traced(pts, rays, key, spp=100, max_bounces=10,
                                 **kw)
        mean = float(img.mean())
        warm = time.perf_counter() - t0
        results[tag] = {"warm_s": round(warm, 3),
                        "first_incl_compile_s": round(first, 1),
                        "img_mean": round(mean, 5),
                        "faces": int(np.asarray(sf).shape[0])}
    except Exception as e:
        results[tag] = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(f"# {tag}: {results[tag]}", flush=True)


bench("mega_100k", 100_000, fused=False)
bench("fused_30k", 30_000)

print(json.dumps(results))
with open("tools/logs/exp_r5_midscale_cross.json", "w") as fh:
    json.dump(results, fh, indent=1)
