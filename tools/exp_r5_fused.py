"""Fused exact twopass (retrace outside the kernel) on the headline
workload, plus the parity kernel's structural ceiling.

Measurements (one process, 1M-tri 8192^2 headline batch):
  wt32              shipped watertight (in-kernel twopass)   [baseline]
  wt32_fused        traverse_bvh8_exact_fused: flag-only kernel +
                    in-graph row gather/exact-retrace/scatter
                    -> record bit-compare vs wt32 over all 67M rays
  wt32_noexact_orc  exact off AND oracle t-bounds: every parity-safe
                    cost removed + perfect culling = the STRUCTURAL
                    CEILING of the watertight packet kernel on v5e
  woop32_orc        same ceiling for the cheapest (non-parity) leaf
                    kernel, for the ceiling artifact
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.core.options import BVHTraceOptions
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import (
    detect_specialization, tile_image_rays, traverse_bvh8,
    traverse_bvh8_exact_fused)

RES = 8192
R = RES * RES
results = {}
OPT_FAST = BVHTraceOptions(exact_edge_fallback=False)
OPT_EXACT = BVHTraceOptions()

v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
bvh, _ = build_triangle_bvh(
    mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
s16 = collapse_bvh8(bvh, v, f, width=16, woop=True)
s16 = s16._replace(
    nodes=jax.device_put(jnp.asarray(s16.nodes)),
    leafs=jax.device_put(jnp.asarray(s16.leafs)),
    leafs_woop=jax.device_put(jnp.asarray(s16.leafs_woop)),
)
cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
              width=RES, height=RES, fov=60.0)
rays32, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
spec32 = detect_specialization(rays32, sub=32)
print(f"# spec32 {spec32}", flush=True)


def timed(tag, fn, reps=3):
    out = fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    results[tag] = {"mrays": round(R / min(ts) / 1e6, 1),
                    "best_ms": round(min(ts) * 1e3, 1)}
    print(f"# {tag}: {results[tag]}", flush=True)
    return out


def run_plain(**kw):
    def fn():
        h = traverse_bvh8(s16, rays32, sub=32, specialize=spec32, **kw)
        return float(h.t.min()), h
    return fn


h_wt = timed("wt32", run_plain())[1]

fused_j = jax.jit(
    lambda sc, rt: traverse_bvh8_exact_fused(
        sc, rt, sub=32, specialize=spec32))


def run_fused():
    h, ov = fused_j(s16, rays32)
    return float(h.t.min()), (h, ov)


(_, (h_fu, ov)) = timed("wt32_fused", run_fused)
results["fused_overflow"] = bool(ov)
results["fused_record_diffs"] = {
    k: int(np.sum(np.asarray(getattr(h_fu, k))
                  != np.asarray(getattr(h_wt, k))))
    for k in ("prim_id", "t", "u", "v")
}
print(f"# fused vs wt32: overflow={results['fused_overflow']} "
      f"diffs={results['fused_record_diffs']}", flush=True)

# structural ceiling: oracle t-bounds (per-ray FINAL t precomputed)
# + exact machinery off. Uses the decomposition instrument.
oracle = np.asarray(h_wt.t, np.float32).reshape(-1)
oracle = np.where(np.isfinite(oracle), np.nextafter(
    oracle, np.float32(np.inf)), np.float32(np.inf))
oracle_d = jax.device_put(jnp.asarray(oracle))

timed("wt32_noexact_orc",
      run_plain(options=OPT_FAST, _oracle_t=oracle_d))
timed("woop32_orc",
      run_plain(intersector="woop", _oracle_t=oracle_d))

with open("tools/logs/exp_r5_fused.json", "w") as fh:
    json.dump(results, fh, indent=1)
print(json.dumps(results))
