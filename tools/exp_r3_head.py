"""Round-3: headline kernel knob probe on width-16 tables, same-process
A/B at 1M tris / 8192^2 rays.

NOTE pop_n=3 is NOT probed: width-16 at pop_n=3 needs 48 hit-mask bits
(> int32), and the silent clamp means any earlier "pop3" numbers at
width 16 measured an identical pop2 kernel. The open knob is lq_cap=3/4
for VMEM scenes (clamped pending a fault probe — HBM modes verified
fault-free after the r3 DMA-scratch fix). FAULT-RISKY variants run LAST
(a faulted process keeps failing; memory/axon-tpu-quirks).

Run: nohup python tools/exp_r3_head.py > tools/logs/exp_r3_head.out 2> tools/logs/exp_r3_head.log &
"""
import json
import os
import sys
import time

os.environ["NANORT_EXPERIMENTAL_UNCLAMP"] = "1"  # lq_cap probe

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

    def tables(woop):
        s = collapse_bvh8(bvh, v, f, width=16, woop=woop)
        return s._replace(
            nodes=jax.device_put(jnp.asarray(s.nodes)),
            leafs=jax.device_put(jnp.asarray(s.leafs)),
            leafs_woop=(jax.device_put(jnp.asarray(s.leafs_woop))
                        if s.leafs_woop is not None else None))

    hits0 = {}

    def bench(tag, s8, sub, tile_h, refkey=None, spec_override=None, **kw):
        tile_w = min((8 * sub * 32) // tile_h, res)
        rays_t, _ = tile_image_rays(pinhole_rays(cam), tile_h, tile_w)
        spec = detect_specialization(rays_t, sub=sub)
        log(f"{tag} spec={spec}")
        if spec_override is not None:
            spec = spec_override(spec)

        def go():
            h = traverse_bvh8(s8, rays_t, sub=sub, specialize=spec, **kw)
            float(h.t.min())
            return h
        h = go()
        if refkey:
            if refkey in hits0:
                RES[tag + "_primdiff"] = int(
                    (np.asarray(h.prim_id) != hits0[refkey]).sum())
            else:
                hits0[refkey] = np.asarray(h.prim_id)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            go()
            ts.append(time.perf_counter() - t0)
        RES[tag] = round(res * res / min(ts) / 1e6, 1)
        log(f"{tag}: {RES[tag]} Mrays/s {[round(x*1e3) for x in ts]} ms")
        print(json.dumps(RES), flush=True)

    # safe first: uniform_sign OFF baselines (r2-comparable), then ON
    nosign = lambda s: (s[0], s[1], False)
    sw = tables(False)
    bench("wt16_nosign", sw, 32, 128, refkey="wt", spec_override=nosign)
    bench("wt16_base", sw, 32, 128, refkey="wt")
    s8w = tables(True)
    bench("woop16_nosign", s8w, 64, 256, intersector="woop", refkey="woop",
          spec_override=nosign)
    bench("woop16_base", s8w, 64, 256, intersector="woop", refkey="woop")
    # fault-risky LAST (lq_cap>2, VMEM scene)
    bench("woop16_lq3", s8w, 64, 256, intersector="woop", lq_cap=3,
          refkey="woop")
    del s8w
    bench("wt16_lq3", sw, 32, 128, lq_cap=3, refkey="wt")
    bench("wt16_lq4", sw, 32, 128, lq_cap=4, refkey="wt")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(f"FATAL {type(e).__name__}: {e}")
        raise
