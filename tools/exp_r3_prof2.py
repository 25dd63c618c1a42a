"""Round-3: headline balance + renderer overhead profiling.

Phase 1 (1M tris, watertight BVH16 sub32): debug_counts on the default
config -> node pops vs leaf drains per packet (which phase to attack);
same-process th64/128/256 A/B for the wt tile shape.
Phase 2 (config A scene): stage-wise AO timing — primary packet pass,
key argsort, AO megabatch kernel — to find the 0.294s -> 0.1s gap.
Phase 3 (fault probe, LAST): pop_n=3 at width 16.

Run: nohup python tools/exp_r3_prof2.py > tools/logs/exp_r3_prof2.out 2> tools/logs/exp_r3_prof2.log &
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


def timeit(tag, fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    log(f"{tag}: {min(ts)*1e3:.0f} ms {[round(x*1e3) for x in ts]}")
    RES[tag] = round(min(ts) * 1e3)
    print(json.dumps(RES), flush=True)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import (
        make_cornell_box,
        make_subdivided_sphere_scene,
        make_uv_sphere,
        merge_meshes,
    )
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization,
        tile_image_rays,
        traverse_bvh8,
    )

    # ---- phase 1: headline balance ----
    res = 8192
    v, f = make_subdivided_sphere_scene(1_000_000)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9))
    s16 = collapse_bvh8(bvh, v, f, width=16)
    s16 = s16._replace(nodes=jax.device_put(jnp.asarray(s16.nodes)),
                       leafs=jax.device_put(jnp.asarray(s16.leafs)))
    cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                  width=res, height=res, fov=60.0)
    rays = pinhole_rays(cam)

    for th in (128, 64, 256):
        rays_t, _ = tile_image_rays(rays, th, (8 * 32 * 32) // th)
        spec = detect_specialization(rays_t)

        def run():
            h = traverse_bvh8(s16, rays_t, sub=32, specialize=spec)
            return float(h.t.min())

        t = timeit(f"wt16_sub32_th{th}_ms", run)
        RES[f"wt16_sub32_th{th}_mrays"] = round(res * res / t / 1e6, 1)
        print(json.dumps(RES), flush=True)

    # debug counts at the default tile (pops vs drains per packet)
    rays_t, _ = tile_image_rays(rays, 128, 64)
    spec = detect_specialization(rays_t)
    h = traverse_bvh8(s16, rays_t, sub=32, specialize=spec,
                      debug_counts=True)
    float(h.t.min())
    pops = np.asarray(h.u.reshape(-1)[:: 32 * 128])
    drains = np.asarray(h.v.reshape(-1)[:: 32 * 128])
    log(f"pops/packet mean {pops.mean():.1f} p50 {np.median(pops):.0f} "
        f"max {pops.max()}; drains/packet mean {drains.mean():.1f} "
        f"p50 {np.median(drains):.0f} max {drains.max()}")
    RES["pops_mean"] = round(float(pops.mean()), 1)
    RES["drains_mean"] = round(float(drains.mean()), 1)
    print(json.dumps(RES), flush=True)
    del s16

    # ---- phase 2: config A stages ----
    from nanort_tpu.models.objrender import render_ao
    from nanort_tpu.traverse.ray_sort import ray_sort_keys

    va, fa = merge_meshes(make_cornell_box(2.0), make_uv_sphere(64, 128, 0.6))
    mesha = TriangleMesh(vertices=jnp.asarray(va), faces=jnp.asarray(fa))
    opt8 = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    bvha, _ = build_triangle_bvh(mesha, opt8)
    s8a = collapse_bvh8(bvha, va, fa)
    s8a = s8a._replace(nodes=jnp.asarray(s8a.nodes),
                       leafs=jnp.asarray(s8a.leafs))
    cama = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                   width=512, height=512, fov=45.0)
    raysa = pinhole_rays(cama)
    key = jax.random.PRNGKey(7)
    speca = detect_specialization(raysa)

    def run_a():
        aovs, _ = render_ao(bvha, mesha, raysa, key, n_samples=8,
                            max_leaf=8, scene8=s8a, specialize=speca)
        return float(np.asarray(aovs["ao"].min()))

    timeit("configA_full_ms", run_a)

    # primary pass alone
    rays_p, _ = tile_image_rays(raysa, 64, 64)
    spec_p = detect_specialization(rays_p)

    def run_prim():
        h = traverse_bvh8(s8a, rays_p, specialize=spec_p)
        return float(h.t.min())

    timeit("configA_primary_ms", run_prim)

    # AO megabatch alone: hemisphere rays from the primary hits
    from nanort_tpu.traverse.ray_sort import traverse_bvh8_sorted
    from nanort_tpu.models.objrender import build_onb, face_normals
    from nanort_tpu.models.objrender import _cosine_hemisphere
    from nanort_tpu import make_rays

    hp = traverse_bvh8(s8a, rays_p, specialize=spec_p)
    hitm = hp.prim_id != jnp.uint32(0xFFFFFFFF)
    nrm = face_normals(mesha, jnp.where(hitm, hp.prim_id, 0).astype(jnp.uint32))
    x = rays_p.org + rays_p.dir * hp.t[..., None]
    nrm = jnp.where((nrm * rays_p.dir).sum(-1, keepdims=True) > 0, -nrm, nrm)
    t_o, b_o = build_onb(nrm)
    S = 8
    local = _cosine_hemisphere(key, (S,) + hitm.shape, jnp.float32)
    wdir = (local[..., 0:1] * t_o[None] + local[..., 1:2] * b_o[None]
            + local[..., 2:3] * nrm[None])
    borg = jnp.broadcast_to(x + nrm * 1e-4, (S,) + x.shape).reshape(-1, 3)
    bdir = wdir.reshape(-1, 3)
    bmax = jnp.where(jnp.broadcast_to(hitm, (S,) + hitm.shape).reshape(-1),
                     1e30, -1.0)
    brays = make_rays(borg, bdir, max_t=bmax)
    jax.block_until_ready(brays.org)

    def run_ao_mb():
        h = traverse_bvh8_sorted(s8a, brays, occlusion=True)
        return float(h.t.min())

    timeit("configA_aobatch_ms", run_ao_mb)

    sort_fn = jax.jit(lambda o, d: jnp.argsort(ray_sort_keys(
        make_rays(o, d), jnp.zeros(3), jnp.ones(3))))

    def run_sort():
        return int(sort_fn(borg, bdir).min())

    timeit("configA_argsort_ms", run_sort)

    # ---- phase 3 (LAST, may fault): pop_n=3 at width 16, 1M tris ----
    if os.environ.get("EXP_POP3", "1") == "1":
        s16b = collapse_bvh8(bvh, v, f, width=16)
        s16b = s16b._replace(nodes=jax.device_put(jnp.asarray(s16b.nodes)),
                             leafs=jax.device_put(jnp.asarray(s16b.leafs)))
        rays_t, _ = tile_image_rays(rays, 128, 64)
        spec = detect_specialization(rays_t)
        try:
            def run3():
                h = traverse_bvh8(s16b, rays_t, sub=32, specialize=spec,
                                  pop_n=3)
                return float(h.t.min())

            t = timeit("wt16_sub32_pop3_ms", run3)
            RES["wt16_pop3_mrays"] = round(res * res / t / 1e6, 1)
        except Exception as e:  # noqa: BLE001
            log(f"pop3 width16 FAULTED: {type(e).__name__} {str(e)[:160]}")
            RES["wt16_pop3_mrays"] = None
        print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    main()
