"""r4 wave 4: in-kernel watertight refit of the woop winner (VERDICT
r3 #1 — the drained-row replay variant). After the woop traversal, the
kernel replays every drained raw leaf row through the watertight
evaluator and overwrites (t, u, v) for prim-id-matched winners
(pallas_packet.refit_inkernel).

The r4 feasibility stats (exp_r4_refitstats.out: winning rows ~0.53x
drains; replay = ALL drains x one watertight row eval) predict the
replay costs about the woop/watertight leaf-phase delta back — this
measures it for real, plus the record agreement vs the watertight
engine on the full 67M-ray bench batch.

Run: nohup python tools/exp_r4_refit.py > \
    tools/logs/exp_r4_refit.out 2>&1 &
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

    hits = {}

    def bench(tag, rays_t, spec, keep=False, **kw):
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
            if keep:
                hits[tag] = h
        except Exception as e:  # noqa: BLE001
            emit(tag + "_err", f"{type(e).__name__}: {e}"[:200])
            time.sleep(130)  # TPU fault recovery before the next variant

    bench("wt_s32", rays32, spec32, keep=True, sub=32)
    if not os.environ.get("R4_REFIT_ONLY"):
        bench("woop_s64", rays64, spec64, sub=64, intersector="woop")
    bench("woop_s64_refit", rays64, spec64, keep=True,
          sub=64, intersector="woop", refit_inkernel=True)
    bench("woop_s32_refit", rays32, spec32, keep=True,
          sub=32, intersector="woop", refit_inkernel=True)

    # record agreement vs the watertight engine (device-side reductions;
    # wt_s32 traversed (128,64) tiles, woop_s32_refit the same — compare
    # those; the s64 run used a different tile order so skip it)
    if "wt_s32" in hits and "woop_s32_refit" in hits:
        a, b = hits["wt_s32"], hits["woop_s32_refit"]
        bits = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        sameprim = (a.prim_id == b.prim_id) & a.hit & b.hit
        emit("hitmask_diffs", int(jnp.sum(a.hit != b.hit)))
        emit("prim_diffs", int(jnp.sum((a.prim_id != b.prim_id)
                                       & a.hit & b.hit)))
        for fld in ("t", "u", "v"):
            d = jnp.sum(sameprim & (bits(getattr(a, fld))
                                    != bits(getattr(b, fld))))
            emit(f"{fld}_bitdiffs_sameprim", int(d))


if __name__ == "__main__":
    main()
