"""r4 wave 2a: feasibility stats for the IN-KERNEL watertight refit of
the woop winner (VERDICT r3 item #1).

The planned kernel shape: after the woop traversal loop, loop over the
DISTINCT winning leaf rows of the packet (scalar min-fold per
iteration), fetch the watertight row, and re-intersect each ray's
winning (row, slot) with the watertight test. Cost model:

    refit_cost ~= n_distinct_winning_rows x (one watertight drain)
    main loop  ~= n_drains x (one woop drain) + n_pops x node step

This script measures, on the exact headline workload (1M-tri sphere,
8192^2 primaries, tiled, sub=64 turbo packets):
  * per-packet leaf drains + node pops (debug_counts kernel), and
  * per-packet distinct winning rows (host-side: prim_id -> leaf row
    via the pid lanes of the leaf table),
so the refit overhead ratio = winning_rows / (drains + pops*alpha) is
known BEFORE building the kernel. Also counts woop-vs-watertight prim
selection mismatches on this workload (the "0 record bit-diffs" bar).

Run: nohup python tools/exp_r4_refitstats.py > \
    tools/logs/exp_r4_refitstats.out 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = {}


def emit(k, v):
    OUT[k] = v
    print(json.dumps(OUT), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        LANES,
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    n_tris = 1_000_000
    res = 8192
    leaf = 9
    sub = 64  # turbo packet size

    v, f = make_subdivided_sphere_scene(n_tris)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, stats = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=leaf,
                              max_leaf_primitives=leaf))
    s8 = collapse_bvh8(bvh, v, f, width=16, woop=True)
    emit("tris", int(len(f)))
    emit("leaf_rows", int(s8.num_leaf_rows))

    # host prim -> leaf row map from the pid lanes (watertight layout:
    # 9 floats/tri at 9*ti, pid at 90+ti)
    leafs = np.asarray(s8.leafs)
    prim2row = np.full(len(f), -1, np.int64)
    for ti in range(s8.max_leaf):
        pids = leafs[:, 90 + ti].astype(np.int64)
        rows = np.arange(leafs.shape[0], dtype=np.int64)
        live = np.zeros(leafs.shape[0], bool)
        # slot occupied iff some count covers it: detect via pid lane
        # nonzero-or-slot0 heuristic is unsafe; instead mark by vertex
        # data: an unoccupied slot has all-zero 9 floats AND pid 0.
        tri9 = leafs[:, 9 * ti:9 * ti + 9]
        live = (np.abs(tri9).sum(axis=1) > 0) | (pids != 0)
        prim2row[pids[live]] = rows[live]
    emit("prim2row_unmapped", int((prim2row < 0).sum()))

    s8d = s8._replace(nodes=jnp.asarray(s8.nodes),
                      leafs=jnp.asarray(s8.leafs),
                      leafs_woop=jnp.asarray(s8.leafs_woop))

    cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                  width=res, height=res, fov=60.0)
    rays = pinhole_rays(cam)
    tile_h = 256
    tile_w = min((8 * sub * 32) // tile_h, res)
    rays_t, _ = tile_image_rays(rays, tile_h, tile_w)
    spec = detect_specialization(rays_t, sub=sub)
    emit("spec", repr(spec))

    # --- woop + watertight traces; prim selection mismatches ---
    t0 = time.perf_counter()
    h_w = traverse_bvh8(s8d, rays_t, sub=sub, intersector="woop",
                        specialize=spec)
    pid_w = np.asarray(h_w.prim_id)
    emit("woop_first_s", round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter()
    h_t = traverse_bvh8(s8d, rays_t, sub=32, specialize=spec)
    pid_t = np.asarray(h_t.prim_id)
    emit("wt_first_s", round(time.perf_counter() - t0, 1))
    hit_w = pid_w != np.uint32(0xFFFFFFFF)
    hit_t = pid_t != np.uint32(0xFFFFFFFF)
    emit("hits_w", int(hit_w.sum()))
    emit("hit_mask_diffs", int((hit_w != hit_t).sum()))
    sel = hit_w & hit_t & (pid_w != pid_t)
    emit("prim_sel_diffs", int(sel.sum()))
    tw = np.asarray(h_w.t)
    tt = np.asarray(h_t.t)
    if sel.any():
        emit("sel_diff_t_relerr_max",
             float(np.abs(tw[sel] - tt[sel]).max()))
    same = hit_w & hit_t & (pid_w == pid_t)
    emit("t_bitdiffs_sameprim", int((tw[same] != tt[same]).sum()))

    # --- per-packet distinct winning rows (host) ---
    flat_pid = pid_w.reshape(-1)
    flat_hit = hit_w.reshape(-1)
    R = flat_pid.shape[0]
    packet = sub * LANES
    n_pk = R // packet
    win_rows = np.where(flat_hit, prim2row[np.where(flat_hit, flat_pid, 0)],
                        -1).reshape(n_pk, packet)
    distinct = np.array([
        len(np.unique(win_rows[p][win_rows[p] >= 0]))
        for p in range(n_pk)
    ])
    emit("refit_rows_mean", float(distinct.mean()))
    emit("refit_rows_p50", int(np.percentile(distinct, 50)))
    emit("refit_rows_p95", int(np.percentile(distinct, 95)))
    emit("refit_rows_max", int(distinct.max()))

    # --- per-packet pops/drains (debug_counts kernel) ---
    h_d = traverse_bvh8(s8d, rays_t, sub=sub, intersector="woop",
                        specialize=spec, debug_counts=True)
    pops = np.asarray(h_d.u).reshape(n_pk, packet)[:, 0]
    drains = np.asarray(h_d.v).reshape(n_pk, packet)[:, 0]
    emit("pops_mean", float(pops.mean()))
    emit("drains_mean", float(drains.mean()))
    emit("refit_over_drains", float(distinct.mean() / max(drains.mean(), 1)))


if __name__ == "__main__":
    main()
