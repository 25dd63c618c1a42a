"""Incoherent-random e2e knob sweep (matrix protocol, post-compaction).

K trades klist extraction cost (8 min-extraction rounds over the dense
(R, T) grid) against completion-sweep overflow; T trades dense-test
cost against per-treelet brute work. Each variant times the full
traverse_bvh8_binned e2e on the exact matrix workload. New (T, sub)
combos can trigger multi-minute Pallas recompiles — the sweep keeps
sub fixed at 16 and T at the tracked 512 except one T=1024 probe.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nanort_tpu import BVHBuildOptions, build_triangle_bvh, make_rays
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.treelet import make_treelets, traverse_bvh8_binned

results = {}
R = 4_194_304

v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
bvh, _ = build_triangle_bvh(
    mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
s8_base = collapse_bvh8(bvh, v, f)

rng = np.random.default_rng(11)
lo, hi = np.asarray(bvh.bmin[0]), np.asarray(bvh.bmax[0])
org = rng.uniform(lo, hi, (R, 3)).astype(np.float32)
d = rng.normal(size=(R, 3))
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays = make_rays(org, d.astype(np.float32))

ref_pid = None
for T, K, sub, flat in ((512, 8, 16, 0), (512, 6, 16, 0), (512, 4, 16, 0),
                        (1024, 8, 16, 0), (512, 8, 16, 1), (512, 8, 4, 1),
                        (512, 8, 4, 0), (512, 8, 2, 1)):
    tl, s8 = make_treelets(s8_base, T, flat=bool(flat))
    s8 = s8._replace(nodes=jax.device_put(jnp.asarray(s8.nodes)),
                     leafs=jax.device_put(jnp.asarray(s8.leafs)))

    def run():
        h = traverse_bvh8_binned(s8, rays, treelets=tl, K=K,
                                 octant_major=True, sub=sub)
        return float(h.t.min()), h

    _, h = run()
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    tag = f"T{T}_K{K}_s{sub}" + ("_flat" if flat else "")
    pid = np.asarray(h.prim_id)
    if ref_pid is None:
        ref_pid = pid
        diffs = 0
    else:
        diffs = int((pid != ref_pid).sum())
    results[tag] = {"mrays": round(R / min(ts) / 1e6, 3),
                    "s": round(min(ts), 3), "prim_diffs_vs_first": diffs}
    print(f"# {tag}: {json.dumps(results[tag])}", flush=True)

with open("tools/logs/exp_r5_incoknobs.json", "w") as fh:
    json.dump(results, fh, indent=1)
print(json.dumps(results))
