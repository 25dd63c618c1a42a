"""Attack the exact-edge overhead (r5 decomp: the twopass machinery
costs 11% — wt 145.4 vs wt_noexact 161.7 — nearly the whole
watertight-vs-woop gap).

Hypotheses to separate:
  (a) collect ops in pass 1 (z-flag accumulation, ~6 vec ops/tri)
  (b) the PRESENCE of the in-kernel pass-2 body (a full second copy of
      the traversal loop: VREG pressure / scheduling)
  (c) sub=64 watertight: does removing the exact machinery also fix the
      VREG-pressure regression?

Measurements (one process, 1M-tri headline workload):
  wt32            shipped watertight (in-kernel twopass)      [baseline]
  wt32_noexact    exact off                                   [ceiling]
  wt32_flag       collect on, NO pass-2 body (_flag_zero_edges)
  wt32_single     inline Dekker recompute every leaf
  wt64_noexact    sub=64 256x64 tiles, exact off
  wt64_flag       sub=64 flags
  woop64          shipped turbo config (same-process reference)
  proto2          host-orchestrated twopass: jitted pass1+flag-fold,
                  one small readback, jitted gather/fix/merge of
                  flagged packets only — record-compared against wt32
"""
import functools
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
    LANES, detect_specialization, tile_image_rays, traverse_bvh8)

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
rays64, _ = tile_image_rays(pinhole_rays(cam), 256, 64)
spec64 = detect_specialization(rays64, sub=64)
print(f"# spec32 {spec32} spec64 {spec64}", flush=True)


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


def run_plain(rays_t, sub, spec, **kw):
    def fn():
        h = traverse_bvh8(s16, rays_t, sub=sub, specialize=spec, **kw)
        return float(h.t.min()), h
    return fn


h_wt = timed("wt32", run_plain(rays32, 32, spec32))[1]
timed("wt32_noexact", run_plain(rays32, 32, spec32, options=OPT_FAST))
timed("wt32_single", run_plain(rays32, 32, spec32, exact_mode="single"))


def run_flag(rays_t, sub, spec):
    def fn():
        h, z = traverse_bvh8(s16, rays_t, sub=sub, specialize=spec,
                             options=OPT_FAST, _flag_zero_edges=True)
        return float(h.t.min()), (h, z)
    return fn


(_, (h_f, z_f)) = timed("wt32_flag", run_flag(rays32, 32, spec32))
packet = 32 * LANES
pf = np.asarray(jnp.max(z_f.reshape(-1, packet), axis=1))
results["flag_stats"] = {
    "flagged_packets": int((pf > 0).sum()),
    "n_packets": int(pf.shape[0]),
    "flagged_rays": int(np.asarray(jnp.sum(z_f))),
}
print(f"# flags: {results['flag_stats']}", flush=True)

timed("wt64_noexact", run_plain(rays64, 64, spec64, options=OPT_FAST))
timed("wt64_flag", run_flag(rays64, 64, spec64))
timed("woop64", run_plain(rays64, 64, spec64, intersector="woop"))

# ---------------------------------------------------------------
# prototype: host-orchestrated exact twopass with jitted halves
# ---------------------------------------------------------------
NPK = R // packet


@functools.partial(jax.jit, static_argnames=("sub", "spec"))
def pass1(scene, rays_t, sub, spec):
    h, z = traverse_bvh8(scene, rays_t, sub=sub, specialize=spec,
                         options=OPT_FAST, _flag_zero_edges=True)
    flat = z.reshape(-1, sub * LANES)
    return h, jnp.max(flat, axis=1)


@functools.partial(jax.jit, static_argnames=("sub", "spec"),
                   donate_argnums=(2,))
def pass2(scene, rays_t, hits, pidx, sub, spec):
    pk = sub * LANES
    idx = (pidx[:, None] * pk + jnp.arange(pk, dtype=jnp.int32)[None, :]
           ).reshape(-1)
    bs = rays_t.batch_shape
    take = lambda x: jnp.take(
        x.reshape((-1,) + x.shape[len(bs):]), idx, axis=0)
    sub_rays = jax.tree_util.tree_map(take, rays_t)
    fixed = traverse_bvh8(scene, sub_rays, sub=sub, specialize=spec,
                          options=OPT_EXACT, exact_mode="single")
    merge = lambda full, part: full.reshape(
        (-1,) + full.shape[len(bs):]).at[idx].set(part).reshape(full.shape)
    return jax.tree_util.tree_map(merge, hits, fixed)


def proto2():
    h, pfd = pass1(s16, rays32, 32, spec32)
    pnz = np.nonzero(np.asarray(pfd))[0].astype(np.int32)
    if pnz.size:
        bucket = max(8, 1 << (int(pnz.size) - 1).bit_length())
        pad = np.full(bucket, pnz[0], np.int32)
        pad[:pnz.size] = pnz
        h = pass2(s16, rays32, h, jnp.asarray(pad), 32, spec32)
    return float(h.t.min()), h


(_, h_p) = timed("proto2", proto2)
results["proto2_record_diffs"] = {
    "prim": int(np.sum(np.asarray(h_p.prim_id) != np.asarray(h_wt.prim_id))),
    "t": int(np.sum(np.asarray(h_p.t) != np.asarray(h_wt.t))),
    "u": int(np.sum(np.asarray(h_p.u) != np.asarray(h_wt.u))),
    "v": int(np.sum(np.asarray(h_p.v) != np.asarray(h_wt.v))),
}
print(f"# proto2 vs wt32: {results['proto2_record_diffs']}", flush=True)

with open("tools/logs/exp_r5_exact.json", "w") as fh:
    json.dump(results, fh, indent=1)
print(json.dumps(results))
