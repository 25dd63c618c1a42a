"""Phase decomposition of the incoherent random row (1.094 Mrays/s,
bar >= 2): where do the 3.8 s go?

Reconstructs traverse_bvh8_binned's exact pipeline (same private
helpers, same order) on the matrix workload — 4.19M fully-random rays,
1M-tri scene, T=512/K=8/sub=16/octant_major — timing each stage with
scalar readbacks, plus debug_counts on the round-1/round-2 packet
calls to measure the in-bin union (pops/drains per packet vs the
coherent headline's 8.2/10.7).
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
from nanort_tpu.core.options import INVALID_PRIM_ID, BVHTraceOptions
from nanort_tpu.core.ray import Hits, Rays
from nanort_tpu.core.rowpack import permute_rows
from nanort_tpu.io.procedural import make_subdivided_sphere_scene
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse import treelet as tl_mod
from nanort_tpu.traverse.pallas_packet import traverse_bvh8
from nanort_tpu.traverse.ray_sort import ray_sort_keys

results = {}
R = 4_194_304
T, K, SUB = 512, 8, 16
packet = SUB * 128

v, f = make_subdivided_sphere_scene(1_000_000)
mesh = TriangleMesh(vertices=v, faces=f)
bvh, _ = build_triangle_bvh(
    mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
s8 = collapse_bvh8(bvh, v, f)
tl, s8 = tl_mod.make_treelets(s8, T)
s8 = s8._replace(nodes=jax.device_put(jnp.asarray(s8.nodes)),
                 leafs=jax.device_put(jnp.asarray(s8.leafs)))
T = tl.count

rng = np.random.default_rng(11)
lo_b, hi_b = np.asarray(bvh.bmin[0]), np.asarray(bvh.bmax[0])
org = rng.uniform(lo_b, hi_b, (R, 3)).astype(np.float32)
d = rng.normal(size=(R, 3))
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays = make_rays(org, d.astype(np.float32))


def timed(tag, fn, reps=2):
    out = fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    results[tag] = round(min(ts) * 1e3, 1)
    print(f"# {tag}: {results[tag]} ms", flush=True)
    return out


# ---- end-to-end baseline ----
def run_e2e():
    h = tl_mod.traverse_bvh8_binned(s8, rays, treelets=tl, K=K,
                                    octant_major=True, sub=SUB)
    return float(h.t.min()), h
timed("e2e", run_e2e)
results["e2e_mrays"] = round(R / (results["e2e"] / 1e3) / 1e6, 3)

# ---- stage 1: morton/octant sort ----
lo = jnp.min(tl.bmin, axis=0)
hi = jnp.max(tl.bmax, axis=0)

@jax.jit
def stage_sort(fl):
    skeys = ray_sort_keys(fl, lo, hi, octant_major=True)
    sorder = jnp.argsort(skeys)
    return permute_rows(fl, sorder), sorder

flat, sorder = timed(
    "sort", lambda: jax.block_until_ready(stage_sort(rays)))[0:2]

# ---- stage 2: dense klists ----
bmin_d, bmax_d = jnp.asarray(tl.bmin), jnp.asarray(tl.bmax)

def stage_klists():
    te, td, n_ent = tl_mod._treelet_klists(
        flat.org, flat.dir, flat.min_t, flat.max_t, bmin_d, bmax_d, K)
    return jax.block_until_ready((te, td, n_ent))

t_entry, tid, n_ent = timed("klists", stage_klists)

comps = jnp.concatenate(
    [flat.org, flat.dir, flat.min_t[:, None],
     jnp.full((R, 1), -1.0, flat.org.dtype)], axis=1)
comps = jnp.concatenate(
    [comps, jnp.asarray([[0, 0, 0, 1, 0, 0, 1, -1.0]], comps.dtype)], 0)
best0 = Hits(t=flat.max_t, u=jnp.zeros_like(flat.max_t),
             v=jnp.zeros_like(flat.max_t),
             prim_id=jnp.full(flat.max_t.shape, INVALID_PRIM_ID,
                              jnp.uint32))
roots_dev = jnp.asarray(tl.roots)

# ---- rounds ----
def instrument_sweep(round_tag, td, te, bst):
    C = td.shape[1]
    order, key_s, counts, n_act, n_padded = timed(
        f"{round_tag}_pair_order",
        lambda: jax.block_until_ready(
            tl_mod._pair_order(td, te, bst.t, T, C, packet)))
    n_act = int(n_act)
    n_slots = tl_mod._next_bucket(int(n_padded) + packet, packet)
    results[f"{round_tag}_pairs"] = n_act
    results[f"{round_tag}_slots"] = n_slots
    j_cap = min(R * C, n_slots)
    order_j = jax.lax.slice(order, (0,), (j_cap,))
    key_j = jax.lax.slice(key_s, (0,), (j_cap,))
    slot_comps, pkt_tid, slot_src = timed(
        f"{round_tag}_fill",
        lambda: jax.block_until_ready(tl_mod._pair_fill(
            order_j, key_j, counts, comps, bst.t, T, C, packet,
            n_slots)))
    pkt_root = jnp.where(pkt_tid >= 0,
                         jnp.take(roots_dev, jnp.maximum(pkt_tid, 0)), 0)
    ox, oy, oz, dx, dy, dz, mint, maxt = slot_comps
    brays = Rays(org=jnp.stack([ox, oy, oz], -1),
                 dir=jnp.stack([dx, dy, dz], -1),
                 min_t=mint, max_t=maxt)
    h = timed(
        f"{round_tag}_kernel",
        lambda: jax.block_until_ready(traverse_bvh8(
            s8, brays, sub=SUB, packet_roots=pkt_root)))
    dbg = traverse_bvh8(s8, brays, sub=SUB, packet_roots=pkt_root,
                        debug_counts=True)
    live_pkt = np.asarray(jnp.max(
        maxt.reshape(-1, packet), axis=1)) > 0
    pops = np.asarray(dbg.u).reshape(-1, packet)[:, 0]
    drains = np.asarray(dbg.v).reshape(-1, packet)[:, 0]
    results[f"{round_tag}_pops_mean"] = round(
        float(pops[live_pkt].mean()), 2)
    results[f"{round_tag}_drains_mean"] = round(
        float(drains[live_pkt].mean()), 2)
    results[f"{round_tag}_live_packets"] = int(live_pkt.sum())
    print(f"# {round_tag} counts: {results[f'{round_tag}_pops_mean']} "
          f"pops {results[f'{round_tag}_drains_mean']} drains "
          f"{results[f'{round_tag}_live_packets']} pkts", flush=True)
    merged = timed(
        f"{round_tag}_merge",
        lambda: jax.block_until_ready(tl_mod._pair_merge(
            bst, h.t, h.u, h.v, h.prim_id, slot_src)))
    return merged

best = instrument_sweep("r1", tid[:, 0:1], t_entry[:, 0:1], best0)
best = instrument_sweep("r2", tid[:, 1:K], t_entry[:, 1:K], best)
results["overflow_rays"] = int(np.asarray(n_ent > K).sum())

with open("tools/logs/exp_r5_inco.json", "w") as fh:
    json.dump(results, fh, indent=1)
print(json.dumps(results))
