"""Round-4 experiment: K-way interleaved packet kernel (pallas_packet
_kernel_body_il) on the headline workload.

Checks, in order:
  1. bit-parity of interleave=2 vs interleave=1 (watertight, 2048^2)
  2. perf sweep on the 67M-ray megabatch: watertight K in {1,2} x
     sub in {32,16}, K=4 x sub in {8,16}, woop K=2
Emits one JSON line per measurement (appended), like exp_r3_head3.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES = int(os.environ.get("IL_RES", 8192))
CHECK_RES = 2048
REPS = 3

out = {}


def emit(k, v):
    out[k] = v
    print(json.dumps(out), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization, tile_image_rays, traverse_bvh8)

    v, f = make_subdivided_sphere_scene(1_000_000)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(mesh, BVHBuildOptions(
        min_leaf_primitives=9, max_leaf_primitives=9))
    emit("tris", len(f))

    s8 = collapse_bvh8(bvh, v, f, width=16, woop=True)
    s8 = s8._replace(
        nodes=jax.device_put(jnp.asarray(s8.nodes)),
        leafs=jax.device_put(jnp.asarray(s8.leafs)),
        leafs_woop=jax.device_put(jnp.asarray(s8.leafs_woop)),
    )

    def make_rays(res, sub, tile_h=128):
        cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                      width=res, height=res, fov=60.0)
        rays = pinhole_rays(cam)
        tile_w = min((8 * sub * 32) // tile_h, res)
        rt, _ = tile_image_rays(rays, min(tile_h, res), tile_w)
        return rt

    # ---- 1. bit-parity, interleave=2 vs 1 (watertight, 2048^2) ----
    rt = make_rays(CHECK_RES, 32)
    spec = detect_specialization(rt, sub=32)
    h1 = traverse_bvh8(s8, rt, sub=32, specialize=spec)
    jax.block_until_ready(h1)
    h2 = traverse_bvh8(s8, rt, sub=32, specialize=spec, interleave=2)
    diffs = int(jnp.sum(
        (h1.t != h2.t) | (h1.u != h2.u) | (h1.v != h2.v)
        | (h1.prim_id != h2.prim_id)))
    emit("parity_k2_diffs", diffs)
    hitfrac = float(jnp.mean(h1.t < rt.max_t))
    emit("hit_frac", round(hitfrac, 4))

    # ---- 2. perf sweep (67M rays) ----
    n_rays = RES * RES

    def bench(name, sub, K, intersector="watertight", tile_h=128):
        rt = make_rays(RES, sub, tile_h)
        spec = detect_specialization(rt, sub=sub)
        t0 = time.perf_counter()

        def run():
            h = traverse_bvh8(s8, rt, sub=sub, specialize=spec,
                              intersector=intersector, interleave=K)
            return float(h.t.min())

        run()
        emit(name + "_first_s", round(time.perf_counter() - t0, 1))
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        emit(name, round(n_rays / min(times) / 1e6, 1))

    bench("wt32_k1", 32, 1)
    bench("wt32_k2", 32, 2)
    bench("wt16_k2", 16, 2)
    bench("wt16_k4", 16, 4)
    bench("wt8_k4", 8, 4)
    bench("woop64_k2", 64, 2, intersector="woop", tile_h=256)
    bench("woop32_k2", 32, 2, intersector="woop", tile_h=256)


if __name__ == "__main__":
    main()
