"""r4 wave 2c: multi-pop lane-parallel frustum — amortize the
vector->scalar drain over fr_pop_n nodes per while iteration (v1 lost
17% purely on syncs: 15.1 single-node syncs vs 8.2 dual-node, counts in
exp_r4_frustum.out).

Sweeps fr_pop_n x t_sync_every for watertight sub=32 and woop sub=64,
correctness-checked against the per-ray engine each time. fr_pop_n > 2
needs NANORT_EXPERIMENTAL_UNCLAMP (the per-ray pop_n>2 fault class may
or may not extend to (1,128) frustum fetches — this is the probe; a
fault costs ~2 min of TPU recovery and the next variant retries).

Run: NANORT_EXPERIMENTAL_UNCLAMP=1 nohup python \
    tools/exp_r4_frustum2.py > tools/logs/exp_r4_frustum2.out 2>&1 &
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

    res = 8192

    def cam_rays(tile):
        cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                      width=res, height=res, fov=60.0)
        return tile_image_rays(pinhole_rays(cam), *tile)[0]

    rays32 = cam_rays((128, 64))
    rays64 = cam_rays((256, 64))
    spec32 = detect_specialization(rays32, sub=32)
    spec64 = detect_specialization(rays64, sub=64)

    # references for bit-compare (first 2 reps double as baselines)
    refs = {}

    def bench(tag, rays_t, spec, check_key=None, **kw):
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
            if check_key is not None:
                if check_key not in refs:
                    refs[check_key] = np.asarray(h.prim_id)
                else:
                    d = int((np.asarray(h.prim_id)
                             != refs[check_key]).sum())
                    emit(tag + "_primdiff", d)
        except Exception as e:  # noqa: BLE001
            emit(tag + "_err", f"{type(e).__name__}: {e}"[:200])
            time.sleep(130)  # TPU fault recovery before the next variant

    bench("wt_s32_base", rays32, spec32, check_key="wt", sub=32)
    for fp in (2, 4, 8):
        bench(f"wt_s32_fr{fp}", rays32, spec32, check_key="wt",
              sub=32, frustum=True, frustum_pop_n=fp)
    bench("wt_s32_fr4_ts1", rays32, spec32, check_key="wt",
          sub=32, frustum=True, frustum_pop_n=4, t_sync_every=1)
    bench("wt_s32_fr8_ts1", rays32, spec32, check_key="wt",
          sub=32, frustum=True, frustum_pop_n=8, t_sync_every=1)
    bench("woop_s64_base", rays64, spec64, check_key="woop",
          sub=64, intersector="woop")
    bench("woop_s64_fr4", rays64, spec64, check_key="woop",
          sub=64, intersector="woop", frustum=True, frustum_pop_n=4)
    bench("woop_s64_fr8", rays64, spec64, check_key="woop",
          sub=64, intersector="woop", frustum=True, frustum_pop_n=8)
    bench("woop_s64_fr8_ts1", rays64, spec64, check_key="woop",
          sub=64, intersector="woop", frustum=True, frustum_pop_n=8,
          t_sync_every=1)

    # visit counts for the best wt frustum variant
    try:
        h = traverse_bvh8(s8, rays32, specialize=spec32, sub=32,
                          frustum=True, frustum_pop_n=4,
                          debug_counts=True)
        pops = np.asarray(h.u).reshape(-1, 32 * 128)[:, 0]
        drains = np.asarray(h.v).reshape(-1, 32 * 128)[:, 0]
        emit("pops_fr4", round(float(pops.mean()), 2))
        emit("drains_fr4", round(float(drains.mean()), 2))
    except Exception as e:  # noqa: BLE001
        emit("counts_err", f"{type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
