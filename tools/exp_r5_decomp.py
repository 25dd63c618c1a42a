"""Per-phase cost decomposition of the shipped watertight BVH16 kernel
on the headline workload (VERDICT r4 #1: "break the plateau with
measurement, not guesses").

Model: per-packet time  T = a * pops + b * drains + c
  a = cost of one node_step (pop_n nodes: fetch + 32 slab tests + sync)
  b = cost of one leaf-row drain (fetch + leaf_unroll tri tests)
  c = per-packet fixed cost (setup, output writes, grid overhead)

Instruments:
  * debug_counts: per-packet (pops, drains) counters from the kernel.
  * _oracle_t: start every ray's t bound at its precomputed final t —
    the SAME kernel runs with converged-bound visit counts (fewer pops
    and drains), giving a second (T, pops, drains) point per engine.

With two engines (watertight / woop: same tree, same visit counts,
different leaf math) and two bound modes each, we solve the 4x4 system
for (a, b_wt, b_woop, c) and report where the time actually goes.

Run (real TPU): python tools/exp_r5_decomp.py
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
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.pallas_packet import (
    detect_specialization,
    tile_image_rays,
    traverse_bvh8,
)

RES = 8192
SUB = 32
REPS = 3

v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
bvh, stats = build_triangle_bvh(
    mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
s16 = collapse_bvh8(bvh, v, f, width=16, woop=True)
s16 = s16._replace(
    nodes=jax.device_put(jnp.asarray(s16.nodes)),
    leafs=jax.device_put(jnp.asarray(s16.leafs)),
    leafs_woop=jax.device_put(jnp.asarray(s16.leafs_woop)),
)
cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
              width=RES, height=RES, fov=60.0)
rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
spec = detect_specialization(rays_t, sub=SUB)
print(f"# spec {spec}", flush=True)
R = RES * RES
NPK = R // (SUB * 128)

results = {}


def timed(tag, **kw):
    h = traverse_bvh8(s16, rays_t, sub=SUB, specialize=spec, **kw)
    float(h.t.min())  # force completion through the tunnel
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        h = traverse_bvh8(s16, rays_t, sub=SUB, specialize=spec, **kw)
        float(h.t.min())
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    results[tag] = {
        "best_s": round(best, 4),
        "mrays": round(R / best / 1e6, 2),
        "us_per_packet": round(best / NPK * 1e6, 3),
    }
    print(f"# {tag}: {best*1e3:.1f} ms = {R/best/1e6:.1f} Mrays/s "
          f"({best/NPK*1e6:.2f} us/packet)", flush=True)
    return h


def counts(tag, **kw):
    h = traverse_bvh8(s16, rays_t, sub=SUB, specialize=spec,
                      debug_counts=True, **kw)
    # u = node pops, v = leaf drains, one value per packet broadcast to
    # the ray tile — mean over rays == mean over packets
    pops = float(jnp.mean(h.u))
    drains = float(jnp.mean(h.v))
    results[tag] = {"pops_mean": round(pops, 3),
                    "drains_mean": round(drains, 3)}
    print(f"# {tag}: pops {pops:.2f} drains {drains:.2f}", flush=True)
    return pops, drains


# ---- watertight (shipped headline engine) ----
h_wt = timed("wt")
p_wt, d_wt = counts("wt_counts")
oracle = h_wt.t  # final per-ray t (max_t where miss)
timed("wt_oracle", _oracle_t=oracle)
p_wto, d_wto = counts("wt_oracle_counts", _oracle_t=oracle)

# ---- woop (turbo) at the SAME sub/tiling so unit costs are comparable
h_wp = timed("woop", intersector="woop")
p_wp, d_wp = counts("woop_counts", intersector="woop")
timed("woop_oracle", intersector="woop", _oracle_t=h_wp.t)
p_wpo, d_wpo = counts("woop_oracle_counts", intersector="woop",
                      _oracle_t=h_wp.t)

# ---- solve T = a*pops + b_engine*drains + c (us per packet) ----
A = np.array([
    [p_wt,  d_wt,  0.0,   1.0],
    [p_wto, d_wto, 0.0,   1.0],
    [p_wp,  0.0,   d_wp,  1.0],
    [p_wpo, 0.0,   d_wpo, 1.0],
])
y = np.array([results[k]["us_per_packet"]
              for k in ("wt", "wt_oracle", "woop", "woop_oracle")])
try:
    x, res_, rank, _ = np.linalg.lstsq(A, y, rcond=None)
    a, b_wt, b_woop, c = [float(q) for q in x]
    results["solve"] = {
        "a_us_per_pop": round(a, 4),
        "b_wt_us_per_drain": round(b_wt, 4),
        "b_woop_us_per_drain": round(b_woop, 4),
        "c_us_fixed": round(c, 4),
        "rank": int(rank),
        "wt_breakdown_us": {
            "node_phase": round(a * p_wt, 3),
            "leaf_phase": round(b_wt * d_wt, 3),
            "fixed": round(c, 3),
        },
    }
    print(f"# SOLVE: a={a:.3f} us/pop  b_wt={b_wt:.3f} "
          f"b_woop={b_woop:.3f} us/drain  c={c:.3f} us/packet",
          flush=True)
    print(f"# wt packet budget: node {a*p_wt:.1f}us  leaf "
          f"{b_wt*d_wt:.1f}us  fixed {c:.1f}us "
          f"(total model {a*p_wt+b_wt*d_wt+c:.1f} vs measured "
          f"{results['wt']['us_per_packet']:.1f})", flush=True)
except Exception as e:  # singular system still leaves the raw points
    results["solve"] = {"error": str(e)}

# ---- secondary probes (same process, same scene) ----
# exact-edge twopass overhead: collect pass adds ~1 op/tri + one fold
from nanort_tpu.core.options import BVHTraceOptions
timed("wt_noexact", options=BVHTraceOptions(exact_edge_fallback=False))
# sub=64 watertight (the r4 negative: VREG pressure) with counts
try:
    rays64, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
    spec64 = detect_specialization(rays64, sub=64)
    h = traverse_bvh8(s16, rays64, sub=64, specialize=spec64)
    float(h.t.min())
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        h = traverse_bvh8(s16, rays64, sub=64, specialize=spec64)
        float(h.t.min())
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    hd = traverse_bvh8(s16, rays64, sub=64, specialize=spec64,
                       debug_counts=True)
    results["wt_sub64"] = {
        "best_s": round(best, 4),
        "mrays": round(R / best / 1e6, 2),
        "us_per_packet": round(best / (R // (64 * 128)) * 1e6, 3),
        "pops_mean": round(float(jnp.mean(hd.u)), 3),
        "drains_mean": round(float(jnp.mean(hd.v)), 3),
    }
    print(f"# wt_sub64: {R/best/1e6:.1f} Mrays/s "
          f"pops {results['wt_sub64']['pops_mean']:.2f} "
          f"drains {results['wt_sub64']['drains_mean']:.2f}", flush=True)
except Exception as e:
    results["wt_sub64"] = {"error": str(e)[:200]}

with open("tools/logs/exp_r5_decomp.json", "w") as fh:
    json.dump(results, fh, indent=1)
print(json.dumps(results))
