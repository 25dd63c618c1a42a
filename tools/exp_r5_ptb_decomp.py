"""Config-B fused-kernel bounce decomposition (r5 plateau evidence).

The spp-lane sweep (exp_r5_spplanes{,2}) measured every legal
sample-major packing K in {1,5,10,25,50,100}: best 1.859 s at K=25/az=4
vs the 1.5 s round-4 bar — the packing lever is exhausted. This probe
asks WHERE the remaining 1.86 s lives, by scaling the two static loop
bounds of the fused BVH16 kernel (models/pt_fused.py) on the exact
config-B workload (cornellbox_suzanne, 512^2 x 100 spp):

  b10 (anchor)   max_bounces=10, spp=100   — the shipped config
  b5             max_bounces=5,  spp=100   — bounce-loop scaling
  b1             max_bounces=1,  spp=100   — primary+NEE floor
  b10_s200       max_bounces=10, spp=200   — sample-loop scaling
                 (spp=200 keeps (spp//K) % az == 0 with K=25, az=4;
                  spp=50 would bias the azimuth wedge cycle)

Fitting t(bounces) = a + b*n separates the per-bounce marginal cost
(traversal + NEE + shading on ALL lanes, dead-by-RR or not: the SIMD
bounce loop has no compaction) from the fixed cost. If t is ~linear in
n, RR lane death buys nothing and in-kernel compaction is the only
remaining lever class; if t saturates, the kernel already short-circuits
(it does break out of the bounce loop only when an entire tile's lanes
die).

Each config is its own multi-minute Pallas compile (static grid params);
every run warms at its full (spp, bounces) per the pt_fused footgun.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

from nanort_tpu.io.obj import (
    CORNELL_GROUP_MATERIALS, load_obj, remap_materials_by_object)
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.models.path_tracer import make_pt_scene, render_path_traced

results = {}

m = load_obj("/root/reference/examples/common/cornellbox_suzanne.obj")
m = remap_materials_by_object(m, CORNELL_GROUP_MATERIALS)
pts = make_pt_scene(m.vertices, m.faces, m.material_ids, m.materials,
                    engine="pallas")
sv = np.asarray(m.vertices)
bmin, bmax = sv.min(0), sv.max(0)
ctr = (bmin + bmax) / 2
eye = tuple(ctr + np.asarray([0, 0, 2.5 * (bmax - bmin).max()]))
cam = look_at(eye=eye, center=tuple(ctr), width=512, height=512, fov=45.0)
rays = pinhole_rays(cam)
key = jax.random.PRNGKey(3)

for tag, spp, mb in (("b10", 100, 10), ("b5", 100, 5), ("b1", 100, 1),
                     ("b10_s200", 200, 10)):
    def run():
        img = render_path_traced(pts, rays, key, spp=spp, max_bounces=mb,
                                 azimuth_strata=4, spp_lanes=25)
        return float(img.mean())
    try:
        t0 = time.perf_counter()
        mean = run()
        first = time.perf_counter() - t0
    except Exception as e:
        results[tag] = {"error": f"{type(e).__name__}: {e}"[:160]}
        print(f"# {tag}: {results[tag]}", flush=True)
        continue
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        mean = run()
        ts.append(time.perf_counter() - t0)
    results[tag] = {"best_s": round(min(ts), 3),
                    "first_incl_compile_s": round(first, 1),
                    "img_mean": round(mean, 5)}
    print(f"# {tag}: {results[tag]}", flush=True)

print(json.dumps(results))
with open("tools/logs/exp_r5_ptb_decomp.json", "w") as fh:
    json.dump(results, fh, indent=1)
