"""Sample-major spp packing (spp_lanes) on config B.

Each pixel is replicated K times along consecutive lanes and the fused
BVH kernel's sample loop runs spp/K iterations: a tile holds fewer
pixels, and a pixel's K in-flight samples share their primary hit and
(per-iteration azimuth wedge) a diffuse bounce cone, shrinking the
in-kernel tracer's shared-stack union — the same mechanism as the AO
sample-major recipe (config A 84 ms).

Configs (512^2 x 100 spp, cornellbox_suzanne, warm at FULL spp):
  K=1  az=4   shipped r4 default            [baseline, 1.96 s matrix]
  K=25 az=4   4 iterations, wedge cycle covers 0..3
  K=10 az=5   10 iterations, covers 0..4 twice
  K=5  az=5   20 iterations
Each (K, az) is its own compile (~2-5 min); also checks image agreement
vs K=1 (means within noise) since RNG streams differ by design.
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
SPP = 100

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

ref_mean = None
for tag, k_lanes, az in (("k1_az4", 1, 4), ("k25_az4", 25, 4),
                         ("k10_az5", 10, 5), ("k5_az5", 5, 5)):
    def run():
        img = render_path_traced(pts, rays, key, spp=SPP, max_bounces=10,
                                 azimuth_strata=az, spp_lanes=k_lanes)
        return float(img.mean()), img
    t0 = time.perf_counter()
    mean, _ = run()
    first = time.perf_counter() - t0
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        mean, img = run()
        ts.append(time.perf_counter() - t0)
    if ref_mean is None:
        ref_mean = mean
    results[tag] = {
        "best_s": round(min(ts), 3),
        "first_incl_compile_s": round(first, 1),
        "img_mean": round(mean, 5),
        "rel_mean_vs_k1": round(mean / ref_mean - 1, 4),
    }
    print(f"# {tag}: {results[tag]}", flush=True)

with open("tools/logs/exp_r5_spplanes.json", "w") as fh:
    json.dump(results, fh, indent=1)
print(json.dumps(results))
