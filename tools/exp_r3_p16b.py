"""Round-3 follow-up: dense BVH16 watertight tuning sweep on real TPU.

Knobs around the new wt16_sub32=140.8 anchor (exp_r3_p16): sub 24/48,
tile_h 64/256, lq_cap=3 (VMEM fault probe — run LAST: a fault poisons
the process; see memory/axon-tpu-quirks).

Run: nohup python tools/exp_r3_p16b.py > tools/logs/exp_r3_p16b.out 2> tools/logs/exp_r3_p16b.log &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NANORT_EXPERIMENTAL_UNCLAMP", "1")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh16
    from nanort_tpu.io.procedural import make_subdivided_sphere_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    n_tris = int(os.environ.get("EXP_TRIS", 1_000_000))
    res = int(os.environ.get("EXP_RES", 8192))
    reps = int(os.environ.get("EXP_REPS", 3))
    v, f = make_subdivided_sphere_scene(n_tris)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9)
    )
    t0 = time.perf_counter()
    s16 = collapse_bvh16(bvh, v, f, woop=True)
    log(f"collapse16 {time.perf_counter()-t0:.0f}s: {s16.num_nodes} nodes "
        f"{s16.num_leaf_rows} rows depth {s16.depth}")
    s16 = s16._replace(
        nodes=jax.device_put(jnp.asarray(s16.nodes)),
        leafs=jax.device_put(jnp.asarray(s16.leafs)),
        leafs_woop=jax.device_put(jnp.asarray(s16.leafs_woop)),
    )
    cam = look_at(eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0),
                  width=res, height=res, fov=60.0)
    rays = pinhole_rays(cam)
    n_rays = res * res
    results = {}
    ref_hits = {}
    spec = None
    for name, sub, tile_h, kw in (
        # anchor repeat (ambient tracking) then the sweep; fault probes
        # LAST (a fault poisons the process). Packet tile area is
        # 8*sub*32 pixels: sub must keep tile_w a divisor of the image.
        ("wt16_sub32_th64", 32, 64, {}),
        ("wt16_sub32_th256", 32, 256, {}),
        ("wt16_sub16", 16, 64, {}),
        ("woop16_sub64_th256", 64, 256, dict(intersector="woop")),
        ("woop16_sub128", 128, 128, dict(intersector="woop")),
        ("wt16_sub32_lq3", 32, 128, dict(lq_cap=3)),   # fault probe
        ("wt16_sub32_pop3", 32, 128, dict(pop_n=3)),   # fault probe
    ):
        tile_w = (8 * sub * 32) // tile_h
        rays_t, _ = tile_image_rays(rays, tile_h, tile_w)
        if spec is None:
            spec = detect_specialization(rays_t)
            log(f"spec {spec}")
        kw = dict(kw)
        if kw.get("intersector") == "woop":
            kw["specialize"] = (None, spec[1])
        else:
            kw["specialize"] = spec
        try:
            t0 = time.perf_counter()
            h = traverse_bvh8(s16, rays_t, sub=sub, **kw)
            _ = float(h.t.min())
            log(f"=== {name} first {time.perf_counter()-t0:.0f}s")
            eng = (kw.get("intersector", "watertight"), sub, tile_h)
            if eng in ref_hits:
                b = ref_hits[eng]
                bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
                pd = int((h.prim_id != b.prim_id).sum())
                td = int((bc(h.t) != bc(b.t)).sum())
                log(f"  vs anchor {eng}: prim diffs {pd} t bit-diffs {td}")
            else:
                ref_hits[eng] = h
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                h = traverse_bvh8(s16, rays_t, sub=sub, **kw)
                _ = float(h.t.min())
                ts.append(time.perf_counter() - t0)
            mr = n_rays / min(ts) / 1e6
            results[name] = round(mr, 1)
            log(f"  {name}: {mr:.1f} Mrays/s ({[round(x*1e3) for x in ts]})")
        except Exception as e:  # noqa: BLE001
            log(f"  {name} FAILED {type(e).__name__}: {str(e)[:160]}")
            results[name] = None
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
