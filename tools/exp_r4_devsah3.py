"""r4 wave 9: isolate the device-build trace gap (129 vs host 142,
exp_r4_devsah2) — binary-tree quality or wide-collapse grouping?

Variants on the 1M bench scene, all traced identically:
  host_sah      host binned-SAH binary -> host collapse (142 control)
  host_lbvh     device-style Morton/Karras binary (build_lbvh) -> HOST
                collapse. If this reaches ~142, the Karras binary tree
                is fine and the DEVICE collapse's depth-mod-K grouping
                is the gap; if it lands at ~129, the binary tree itself
                is the gap and the collapse is innocent.
  host_lbvh_l9  same but leaf size 9 exactly like the SAH control.

Run: nohup python tools/exp_r4_devsah3.py > \
    tools/logs/exp_r4_devsah3.out 2>&1 &
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
    from nanort_tpu.build.lbvh import build_lbvh
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    v, f = make_subdivided_sphere_scene(1_000_000)
    emit("tris", int(len(f)))
    mesh = TriangleMesh(vertices=v, faces=f)

    res = 8192
    cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                  width=res, height=res, fov=60.0)
    rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
    spec = detect_specialization(rays_t, sub=32)

    def bench(tag, s):
        try:
            s = s._replace(nodes=jnp.asarray(s.nodes),
                           leafs=jnp.asarray(s.leafs))
            t0 = time.perf_counter()
            h = traverse_bvh8(s, rays_t, specialize=spec, sub=32)
            float(h.t.min())
            emit(tag + "_first_s", round(time.perf_counter() - t0, 1))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                h = traverse_bvh8(s, rays_t, specialize=spec, sub=32)
                float(h.t.min())
                ts.append(time.perf_counter() - t0)
            emit(tag, round(res * res / min(ts) / 1e6, 1))
            h = traverse_bvh8(s, rays_t, specialize=spec, sub=32,
                              debug_counts=True)
            emit(tag + "_pops", round(float(
                np.asarray(h.u).reshape(-1, 32 * 128)[:, 0].mean()), 2))
            emit(tag + "_drains", round(float(
                np.asarray(h.v).reshape(-1, 32 * 128)[:, 0].mean()), 2))
            del s, h
        except Exception as e:  # noqa: BLE001
            emit(tag + "_err", f"{type(e).__name__}: {e}"[:160])
            time.sleep(130)

    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
    bench("host_sah", collapse_bvh8(bvh, v, f, width=16))
    del bvh

    from nanort_tpu.ops.triangle import triangle_prim_bounds

    bmin, bmax, ctr = triangle_prim_bounds(mesh)
    for leaf, tag in ((4, "host_lbvh_l4"), (9, "host_lbvh_l9")):
        lb, _ = build_lbvh(bmin, bmax, ctr, max_leaf=leaf)
        bench(tag, collapse_bvh8(lb, v, f, width=16))
        del lb


if __name__ == "__main__":
    main()
