"""r4 wave 5: config-A AO via azimuth-STRATIFIED hemisphere samples
(VERDICT r3 #3 — the 100 ms bar).

Insight from the r3 decomposition (exp_r3_ao2.out): occlusion-ray
incoherence is RNG-driven — adjacent pixels share normals but draw
independent azimuths, so no layout fixes it and the Morton sort costs
more than it saves (339 vs 163 ms direct). Stratifying the azimuth by
SAMPLE INDEX (sample s jitters phi inside wedge [s, s+1) * 2pi/S) makes
the sample-major layout direction-presorted for free: a packet holds one
wedge x consecutive pixels whose normals agree, i.e. a tight world cone.
Variance also drops (stratification never hurts a cosine-AO estimator).

Variants (512^2 x 8 samples, cornell+sphere ~16K tris):
  occ_pm_base      independent draws, pixel-major direct (shipped layout)
  occ_strat_s{N}   stratified draws, sample-major direct, sub=N
  occ_strat_tile   stratified + 32x32-tiled pixel order, sub=8
  occ_strat_t_s16  same tiled layout, sub=16
  ao_mean_*        sanity: AO image mean of each sampler (stratified is a
                   DIFFERENT (lower-variance) estimator — means agree to
                   ~1/sqrt(samples), not bitwise)

Run: nohup python tools/exp_r4_aostrat.py > \
    tools/logs/exp_r4_aostrat.out 2>&1 &
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
    from nanort_tpu.models.objrender import build_onb, render_aovs
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization, traverse_bvh8,
    )

    opt8 = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(64, 128, 0.6))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh, opt8)
    s8 = collapse_bvh8(bvh, v, f, width=16)
    s8 = s8._replace(nodes=jnp.asarray(s8.nodes), leafs=jnp.asarray(s8.leafs))
    emit("tris", int(len(f)))
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=512, height=512, fov=45.0)
    rays = pinhole_rays(cam)
    key = jax.random.PRNGKey(7)
    S = 8
    spec = detect_specialization(rays)

    aovs, hits = render_aovs(bvh, mesh, rays, None, max_leaf=8, scene8=s8,
                             specialize=spec)
    hit = hits.hit
    n = aovs["normal"]
    n = jnp.where(jnp.sum(n * rays.dir, -1, keepdims=True) > 0, -n, n)
    p = aovs["position"]
    t, bt = build_onb(n)

    def draws(stratified):
        def one(i):
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            u1 = jax.random.uniform(k1, hit.shape, jnp.float32)
            u2 = jax.random.uniform(k2, hit.shape, jnp.float32)
            if stratified:
                u2 = (i.astype(jnp.float32) + u2) / S
            r = jnp.sqrt(u1)
            phi = 2.0 * jnp.pi * u2
            return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                              jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))], -1)
        return jax.vmap(one)(jnp.arange(S))

    def batch(d_local, order):
        d = (d_local[..., 0:1] * t[None] + d_local[..., 1:2] * bt[None]
             + d_local[..., 2:3] * n[None])
        org = jnp.broadcast_to((p + 1e-4 * n)[None], d.shape)
        far = jnp.broadcast_to(
            jnp.where(hit, 1e30, -1.0)[None], d.shape[:-1]
        ).astype(jnp.float32)
        skip = jnp.broadcast_to(hits.prim_id[None], (S,) + hit.shape)
        if order == "pm":  # pixel-major (P, S)
            rs = lambda x: jnp.swapaxes(
                x.reshape((S, -1) + x.shape[3:]), 0, 1
            ).reshape((-1,) + x.shape[3:])
        elif order == "sm":  # sample-major (S, P) row-major pixels
            rs = lambda x: x.reshape((-1,) + x.shape[3:])
        else:  # sample-major, 32x32-tiled pixel order
            def rs(x):
                xx = x.reshape((S, 512, 512) + x.shape[3:])
                xx = xx.reshape((S, 16, 32, 16, 32) + x.shape[3:])
                xx = jnp.swapaxes(xx, 2, 3)
                return xx.reshape((-1,) + x.shape[3:])
        sec = make_rays(rs(org), rs(d), min_t=0.0, max_t=rs(far))
        return sec, rs(skip)

    d_ind = draws(False)
    d_str = draws(True)

    def ao_mean(d_local):
        # XLA-path occlusion (slow but engine-independent estimator check)
        return None  # skip: kernel results below carry the means

    def run(tag, d_local, order, sub):
        try:
            sec, skip = batch(d_local, order)
            jax.block_until_ready(sec.org)

            def go():
                h = traverse_bvh8(s8, sec, skip_prim_id=skip,
                                  occlusion=True, sub=sub)
                return h

            emit(tag + "_ms", timeit(lambda: float(go().t.min())))
            unocc = (~go().hit).astype(jnp.float32)
            emit(tag + "_mean_unocc", round(float(unocc.mean()), 5))
        except Exception as e:  # noqa: BLE001
            emit(tag + "_err", f"{type(e).__name__}: {e}"[:160])
            time.sleep(130)

    run("occ_pm_base", d_ind, "pm", 8)
    run("occ_strat_s8", d_str, "sm", 8)
    run("occ_strat_s4", d_str, "sm", 4)
    run("occ_strat_s16", d_str, "sm", 16)
    run("occ_strat_tile", d_str, "tile", 8)
    run("occ_strat_t_s16", d_str, "tile", 16)
    run("occ_strat_t_s4", d_str, "tile", 4)
    # control: independent draws in the tiled layout (how much of the win
    # is tiling alone?)
    run("occ_ind_tile", d_ind, "tile", 8)


if __name__ == "__main__":
    main()
