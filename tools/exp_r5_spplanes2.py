"""Sample-major spp packing, round 2: the unexplored deep end.

exp_r5_spplanes measured K=1 1.956 s, K=25 1.859 s (az=4 both, means
agree to 0.1%); K at the shallow end (5, 10) with az=5 was slower AND
biased the azimuth marginal (rel_mean +5.5% — (spp//K) % az != 0 held
but the per-iteration wedge cycle no longer covers the strata evenly
per pixel; keep az=4's verified combos). This probes the deep end where
a tile is almost all lanes of few pixels:
  K=50  az=2   2 sample iterations  (100/50 % 2 == 0)
  K=100 az=1   1 sample iteration   (the full sample-major limit)
  K=25  az=4   re-run as the anchor (compile cache is per-process)
Each config is its own multi-minute Pallas compile; warm at FULL spp
(pt_fused docstring footgun).
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
for tag, k_lanes, az in (("k25_az4", 25, 4), ("k50_az2", 50, 2),
                         ("k100_az1", 100, 1)):
    def run():
        img = render_path_traced(pts, rays, key, spp=SPP, max_bounces=10,
                                 azimuth_strata=az, spp_lanes=k_lanes)
        return float(img.mean()), img
    try:
        t0 = time.perf_counter()
        mean, _ = run()
        first = time.perf_counter() - t0
    except Exception as e:
        results[tag] = {"error": f"{type(e).__name__}: {e}"[:160]}
        print(f"# {tag}: {results[tag]}", flush=True)
        continue
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
        "rel_mean_vs_k25": round(mean / ref_mean - 1, 4),
    }
    print(f"# {tag}: {results[tag]}", flush=True)

with open("tools/logs/exp_r5_spplanes2.json", "w") as fh:
    json.dump(results, fh, indent=1)
print(json.dumps(results))
