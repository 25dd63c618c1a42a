"""Round-3 wave 10: leaf-queue depth on the WATERTIGHT width-16 engine.

lq_cap>1 was only ever measured on the woop intersector (woop16_lq3:
+8% over lq1 in the same hour); the watertight VMEM-mode cells lq2/lq3
are unprobed — the r2 "lq_cap>2 faults" turned out to be an undersized
DMA scratch (fixed in r3), and woop16+lq3+UNCLAMP runs fault-free on
the same 1M-tri VMEM tables, so wt16+lq3 is expected safe. If a cell
wins, it becomes the bench.py parity-grade recipe.

Same-process A/B at 1M tris / 8192^2 rays; wt16_base re-measured first
as the in-process reference point (tunnel drifts hour to hour). Hit
records compared bit-exactly against wt16_base at identical tiling.

Run: nohup python tools/exp_r3_head3.py > tools/logs/exp_r3_head3.out 2> tools/logs/exp_r3_head3.log &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


RES = {}


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization, tile_image_rays, traverse_bvh8,
    )

    n_tris, res = 1_000_000, 8192
    v, f = make_subdivided_sphere_scene(n_tris)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
    cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                  width=res, height=res, fov=60.0)

    s = collapse_bvh8(bvh, v, f, width=16, woop=True)
    s = s._replace(
        nodes=jax.device_put(jnp.asarray(s.nodes)),
        leafs=jax.device_put(jnp.asarray(s.leafs)),
        leafs_woop=jax.device_put(jnp.asarray(s.leafs_woop)))

    # all watertight cells share the bench.py tiling (sub=32, 128x64)
    rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 64)
    spec = detect_specialization(rays_t, sub=32)
    ref = {}

    def bench(tag, **kw):
        sub = kw.pop("sub", 32)
        kwspec = kw.pop("specialize", spec)

        def go():
            h = traverse_bvh8(s, rays_t, sub=sub, specialize=kwspec, **kw)
            float(h.t.min())
            return h
        try:
            h = go()
        except Exception as e:
            RES[tag + "_err"] = f"{type(e).__name__}"[:60]
            log(f"{tag} ERR {type(e).__name__}: {e}")
            print(json.dumps(RES), flush=True)
            return
        if "base" in ref:
            rp, rt = ref["base"]
            RES[tag + "_primdiff"] = int((np.asarray(h.prim_id) != rp).sum())
            RES[tag + "_tbitdiff"] = int(
                (np.asarray(h.t).view(np.uint32) != rt.view(np.uint32)).sum())
        else:
            ref["base"] = (np.asarray(h.prim_id), np.array(np.asarray(h.t)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            go()
            ts.append(time.perf_counter() - t0)
        RES[tag] = round(res * res / min(ts) / 1e6, 1)
        log(f"{tag}: {RES[tag]} Mrays/s {[round(x * 1e3) for x in ts]} ms")
        print(json.dumps(RES), flush=True)

    os.environ["NANORT_EXPERIMENTAL_UNCLAMP"] = "1"
    bench("wt16_base")
    bench("wt16_lq2", lq_cap=2)
    bench("wt16_lq3", lq_cap=3)
    bench("wt16_lq4", lq_cap=4)
    bench("wt16_lq3_tsync4", lq_cap=3, t_sync_every=4)
    # cross-check the turbo ceiling in THIS hour for an honest ratio
    rays_w, _ = tile_image_rays(pinhole_rays(cam), 256, 64)
    spec_w = detect_specialization(rays_w, sub=64)

    def bench_woop(tag, **kw):
        # pass the FULL detected specialization tuple, exactly like
        # bench.py's shipped turbo recipe (ADVICE r3 #4: the earlier
        # (None, shared_origin) form dropped kz/uniform_sign and
        # under-measured the turbo ceiling); traverse_bvh8 itself
        # drops kz_static for the woop intersector
        def go():
            h = traverse_bvh8(s, rays_w, sub=64, intersector="woop",
                              specialize=spec_w, **kw)
            float(h.t.min())
        try:
            go()
        except Exception as e:
            RES[tag + "_err"] = f"{type(e).__name__}"[:60]
            return
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            go()
            ts.append(time.perf_counter() - t0)
        RES[tag] = round(res * res / min(ts) / 1e6, 1)
        log(f"{tag}: {RES[tag]} Mrays/s")
        print(json.dumps(RES), flush=True)

    bench_woop("woop16_lq3", lq_cap=3)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(f"FATAL {type(e).__name__}: {e}")
        raise
