"""r4 wave 2b: lane-parallel frustum node phase (width 16) on the
headline workload.

Correctness: bit-compare records vs the per-ray node phase (the
conservative visit superset must not change any accepted record) at
res 2048, plus an incoherent-batch sanity (must auto-fall back to the
per-ray vote via f_coh). Perf: res 8192 sweep over engine x sub x
t_sync_every, plus debug_counts pops/drains growth (how conservative
the frustum visit set is vs the per-ray union).

Run: nohup python tools/exp_r4_frustum.py > \
    tools/logs/exp_r4_frustum.out 2>&1 &
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

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh, make_rays
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    leaf = 9
    v, f = make_subdivided_sphere_scene(1_000_000)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=leaf,
                              max_leaf_primitives=leaf))
    s8 = collapse_bvh8(bvh, v, f, width=16, woop=True)
    s8 = s8._replace(nodes=jnp.asarray(s8.nodes),
                     leafs=jnp.asarray(s8.leafs),
                     leafs_woop=jnp.asarray(s8.leafs_woop))
    emit("tris", int(len(f)))

    def cam_rays(res, tile):
        cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                      width=res, height=res, fov=60.0)
        return tile_image_rays(pinhole_rays(cam), *tile)[0]

    # ---- correctness at res 2048 ----
    rays_c = cam_rays(2048, (128, 64))
    spec_c = detect_specialization(rays_c, sub=32)
    h0 = traverse_bvh8(s8, rays_c, sub=32, specialize=spec_c)
    h1 = traverse_bvh8(s8, rays_c, sub=32, specialize=spec_c,
                       frustum=True)
    for nm in ("t", "u", "v", "prim_id"):
        a = np.asarray(getattr(h0, nm))
        b = np.asarray(getattr(h1, nm))
        emit(f"bitdiff_{nm}", int((a != b).sum()))

    # incoherent sanity: random rays must fall back to per-ray voting
    rng = np.random.default_rng(5)
    lo, hi = np.asarray(bvh.bmin[0]), np.asarray(bvh.bmax[0])
    org = rng.uniform(lo, hi, (65536, 3)).astype(np.float32)
    d = rng.normal(size=(65536, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rr = make_rays(org, d.astype(np.float32))
    hi0 = traverse_bvh8(s8, rr, sub=8)
    hi1 = traverse_bvh8(s8, rr, sub=8, frustum=True)
    emit("inco_bitdiff",
         int(sum((np.asarray(getattr(hi0, n)) != np.asarray(
             getattr(hi1, n))).sum() for n in ("t", "u", "v", "prim_id"))))

    # ---- perf at res 8192 ----
    res = 8192
    variants = [
        ("wt_s32_base", dict(sub=32), (128, 64), False),
        ("wt_s32_fr", dict(sub=32, frustum=True), (128, 64), False),
        ("wt_s32_fr_ts4", dict(sub=32, frustum=True, t_sync_every=4),
         (128, 64), False),
        ("wt_s32_fr_tsm2", dict(sub=32, frustum=True, t_sync_every=-2),
         (128, 64), False),
        ("wt_s64_fr", dict(sub=64, frustum=True), (256, 64), False),
        ("wt_s128_fr", dict(sub=128, frustum=True), (256, 128), False),
        ("woop_s64_base", dict(sub=64, intersector="woop"), (256, 64),
         True),
        ("woop_s64_fr", dict(sub=64, intersector="woop", frustum=True),
         (256, 64), True),
        ("woop_s128_fr", dict(sub=128, intersector="woop", frustum=True),
         (256, 128), True),
    ]
    rays_cache = {}
    for tag, kw, tile, _ in variants:
        if tile not in rays_cache:
            rays_cache[tile] = cam_rays(res, tile)
        rays_t = rays_cache[tile]
        sub = kw.get("sub", 32)
        spec = detect_specialization(rays_t, sub=sub)
        try:
            t0 = time.perf_counter()
            h = traverse_bvh8(s8, rays_t, specialize=spec, **kw)
            float(h.t.min())
            emit(tag + "_first_s", round(time.perf_counter() - t0, 1))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                h = traverse_bvh8(s8, rays_t, specialize=spec, **kw)
                float(h.t.min())
                ts.append(time.perf_counter() - t0)
            emit(tag, round(res * res / min(ts) / 1e6, 1))
        except Exception as e:  # noqa: BLE001
            emit(tag + "_err", f"{type(e).__name__}: {e}"[:200])

    # ---- visit growth: pops/drains per packet, frustum vs per-ray ----
    rays_t = rays_cache[(128, 64)]
    spec = detect_specialization(rays_t, sub=32)
    for tag, kw in (("base", {}), ("fr", dict(frustum=True))):
        try:
            h = traverse_bvh8(s8, rays_t, sub=32, specialize=spec,
                              debug_counts=True, **kw)
            pops = np.asarray(h.u).reshape(-1, 32 * 128)[:, 0]
            drains = np.asarray(h.v).reshape(-1, 32 * 128)[:, 0]
            emit(f"pops_{tag}", round(float(pops.mean()), 2))
            emit(f"drains_{tag}", round(float(drains.mean()), 2))
        except Exception as e:  # noqa: BLE001
            emit(f"counts_{tag}_err", f"{type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
