"""Round-3 wave 5: headline knobs never probed at width 16 — sub size,
t_sync_every, dual_pop, frustum — plus the turbo(lq3)+refit combo as a
parity-headline candidate (is woop+bit-exact-refit faster than the
watertight kernel end-to-end, and does its prim SELECTION match?).

Same-process A/B at 1M tris / 8192^2 rays, wt16_base re-measured as the
in-process reference point.

Run: nohup python tools/exp_r3_head2.py > tools/logs/exp_r3_head2.out 2> tools/logs/exp_r3_head2.log &
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
        detect_specialization, refit_hits_watertight, tile_image_rays,
        traverse_bvh8,
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

    ref_hits = {}

    def bench(tag, s8, sub, tile_h, post=None, **kw):
        tile_w = min((8 * sub * 32) // tile_h, res)
        rays_t, _ = tile_image_rays(pinhole_rays(cam), tile_h, tile_w)
        spec = detect_specialization(rays_t, sub=sub)

        def go():
            h = traverse_bvh8(s8, rays_t, sub=sub, specialize=spec, **kw)
            if post is not None:
                h = post(rays_t, h)
            float(h.t.min())
            return h
        try:
            h = go()
        except Exception as e:
            RES[tag + "_err"] = f"{type(e).__name__}"[:60]
            log(f"{tag} ERR {type(e).__name__}: {e}")
            print(json.dumps(RES), flush=True)
            return
        if "wt" in ref_hits:
            rp, rt = ref_hits["wt"]
            RES[tag + "_primdiff"] = int((np.asarray(h.prim_id) != rp).sum())
            RES[tag + "_tbitdiff"] = int(
                (np.asarray(h.t).view(np.uint32) != rt.view(np.uint32)).sum())
        else:
            ref_hits["wt"] = (np.asarray(h.prim_id), np.array(np.asarray(h.t)))
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            go()
            ts.append(time.perf_counter() - t0)
        RES[tag] = round(res * res / min(ts) / 1e6, 1)
        log(f"{tag}: {RES[tag]} Mrays/s {[round(x*1e3) for x in ts]} ms")
        print(json.dumps(RES), flush=True)

    sw = tables(False)
    bench("wt16_base", sw, 32, 128)           # in-process reference
    bench("wt16_sub16", sw, 16, 128)
    bench("wt16_sub64", sw, 64, 128)
    bench("wt16_tsync1", sw, 32, 128, t_sync_every=1)
    bench("wt16_tsync4", sw, 32, 128, t_sync_every=4)
    bench("wt16_nodual", sw, 32, 128, dual_pop=False)
    bench("wt16_nofrustum", sw, 32, 128, frustum=False)
    del sw
    s8w = tables(True)
    jref = jax.jit(lambda r, h: refit_hits_watertight(mesh, r, h))
    os.environ["NANORT_EXPERIMENTAL_UNCLAMP"] = "1"
    bench("woop16_lq3_refit", s8w, 64, 256, intersector="woop", lq_cap=3,
          post=jref)
    bench("woop16_lq3_raw", s8w, 64, 256, intersector="woop", lq_cap=3)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(f"FATAL {type(e).__name__}: {e}")
        raise
