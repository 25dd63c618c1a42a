"""Round-3 wave 10b: decompose config A (objrender AO 512^2 + 8 samples,
217 ms) into primary pass / ray-gen glue / sort / occlusion traverse, and
probe layout variants that skip the Morton sort (AO rays inherit pixel
coherence from the primary image; the sort's gather tax may be pure
overhead here).

Variants:
  full_shipped   render_ao(scene8, octant_major=True, sub=8)  [reference]
  primary_only   render_aovs through the packet kernel
  occ_sorted     pre-built occlusion batch through traverse_bvh8_sorted
  occ_sorted_oct same + octant_major
  occ_direct_sM  same batch, NO sort, sample-major layout, direct kernel
  occ_direct_pM  same batch, NO sort, pixel-major layout (all 8 samples
                 of 128 consecutive pixels per packet), direct kernel

NOTE on the correctness check (ADVICE r3 #3): the occ_* variants are
compared by their scalar *unoccluded count* against the FIRST occ
variant (occ_sorted), not bit-against full_shipped's AO image — the
shipped image (ao_ref) is rendered for timing only. A "_unoccdiff=0"
therefore shows the occ variants agree with each other; it does not
re-verify occ_sorted against the shipped recipe (that parity is covered
by tests/test_objrender.py). A full_nosort end-to-end variant was
planned but never implemented; the winning layout (occ_direct_pM) was
adopted directly by models/objrender.render_ao instead.

Run: nohup python tools/exp_r3_ao2.py > tools/logs/exp_r3_ao2.out 2> tools/logs/exp_r3_ao2.log &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES = {}


def log(m):
    print(m, file=sys.stderr, flush=True)


def emit(tag, val):
    RES[tag] = val
    log(f"{tag}: {val}")
    print(json.dumps(RES), flush=True)


def timeit(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts) * 1e3)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu import BVHBuildOptions, build_triangle_bvh, make_rays
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import (
        make_cornell_box, make_uv_sphere, merge_meshes,
    )
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.objrender import render_ao, render_aovs
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization, traverse_bvh8,
    )
    from nanort_tpu.traverse.ray_sort import traverse_bvh8_sorted

    opt8 = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(64, 128, 0.6))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh, opt8)
    s8 = collapse_bvh8(bvh, v, f, width=16)
    s8 = s8._replace(nodes=jnp.asarray(s8.nodes), leafs=jnp.asarray(s8.leafs))
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=512, height=512, fov=45.0)
    rays = pinhole_rays(cam)
    key = jax.random.PRNGKey(7)
    S = 8
    spec = detect_specialization(rays)

    def full_shipped():
        aovs, _ = render_ao(bvh, mesh, rays, key, n_samples=S, max_leaf=8,
                            scene8=s8, specialize=spec,
                            octant_major=True, sub=8)
        return aovs

    aovs_ref = full_shipped()
    ao_ref = np.asarray(aovs_ref["ao"])
    float(ao_ref.min())
    emit("full_shipped_ms", timeit(lambda: float(
        full_shipped()["ao"].min())))

    emit("primary_ms", timeit(lambda: float(render_aovs(
        bvh, mesh, rays, None, max_leaf=8, scene8=s8,
        specialize=spec)[0]["depth"].min())))

    # rebuild the occlusion megabatch exactly as render_ao does
    aovs, hits = render_aovs(bvh, mesh, rays, None, max_leaf=8, scene8=s8,
                             specialize=spec)
    hit = hits.hit
    n = aovs["normal"]
    n = jnp.where(jnp.sum(n * rays.dir, -1, keepdims=True) > 0, -n, n)
    p = aovs["position"]
    from nanort_tpu.models.objrender import _cosine_hemisphere, build_onb
    t, bt = build_onb(n)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(S))
    d_local = jax.vmap(lambda k: _cosine_hemisphere(
        k, hit.shape, jnp.float32))(keys)
    d = (d_local[..., 0:1] * t[None] + d_local[..., 1:2] * bt[None]
         + d_local[..., 2:3] * n[None])
    org = jnp.broadcast_to((p + 1e-4 * n)[None], d.shape)
    far = jnp.broadcast_to(
        jnp.where(hit, 1e30, -1.0)[None], d.shape[:-1]).astype(jnp.float32)
    skip = jnp.broadcast_to(hits.prim_id[None], (S,) + hit.shape)
    P = hit.shape[0]

    sec_sM = make_rays(org.reshape(-1, 3), d.reshape(-1, 3), min_t=0.0,
                       max_t=far.reshape(-1))
    skip_sM = skip.reshape(-1)
    # pixel-major: (P, S) ordering
    swap = lambda x: jnp.swapaxes(x, 0, 1).reshape((-1,) + x.shape[2:])
    sec_pM = make_rays(swap(org), swap(d), min_t=0.0, max_t=swap(far))
    skip_pM = swap(skip)
    jax.block_until_ready(sec_pM.org)

    def occ_count(fn):
        h = fn()
        return int((~h.hit).sum())

    ref_unocc = None

    def run(tag, fn):
        nonlocal ref_unocc
        try:
            c = occ_count(fn)
        except Exception as e:
            emit(tag + "_err", type(e).__name__[:40])
            return
        if ref_unocc is None:
            ref_unocc = c
        emit(tag + "_unoccdiff", c - ref_unocc)
        emit(tag + "_ms", timeit(lambda: float(fn().t.min())))

    run("occ_sorted", lambda: traverse_bvh8_sorted(
        s8, sec_sM, skip_prim_id=skip_sM, occlusion=True, sub=8))
    run("occ_sorted_oct", lambda: traverse_bvh8_sorted(
        s8, sec_sM, skip_prim_id=skip_sM, occlusion=True, sub=8,
        octant_major=True))
    run("occ_direct_sM", lambda: traverse_bvh8(
        s8, sec_sM, skip_prim_id=skip_sM, occlusion=True, sub=8))
    run("occ_direct_pM", lambda: traverse_bvh8(
        s8, sec_pM, skip_prim_id=skip_pM, occlusion=True, sub=8))
    run("occ_direct_pM_sub16", lambda: traverse_bvh8(
        s8, sec_pM, skip_prim_id=skip_pM, occlusion=True, sub=16))
    run("occ_direct_pM_sub4", lambda: traverse_bvh8(
        s8, sec_pM, skip_prim_id=skip_pM, occlusion=True, sub=4))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(f"FATAL {type(e).__name__}: {e}")
        raise
