"""Round-3: where do config A's 202 ms go? Measures (a) bare Pallas
dispatch+readback latency through the tunnel, (b) the AO pass phase by
phase (primary packet trace, hemisphere ray gen, occlusion megabatch),
(c) a jitted-together end-to-end call. If fixed dispatch/readback
overhead dominates, the path to <=100 ms is fewer launches (an AO
megakernel), not faster kernels.

Run: nohup python tools/exp_r3_dispatch.py > tools/logs/exp_r3_dispatch.out 2> tools/logs/exp_r3_dispatch.log &
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


def emit(k, v):
    RES[k] = v
    log(f"{k}: {v}")
    print(json.dumps(RES), flush=True)


def timeit(tag, fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    emit(tag, round(min(ts) * 1e3, 1))
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    # (a) bare dispatch: trivial pallas kernel + scalar readback
    def triv(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    call = jax.jit(lambda x: pl.pallas_call(
        triv,
        in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x))
    timeit("bare_pallas_ms", lambda: float(call(x).min()))

    # plain XLA dispatch for comparison
    add = jax.jit(lambda x: x + 1.0)
    timeit("bare_xla_ms", lambda: float(add(x).min()))

    # (b) config A phases
    from nanort_tpu import BVHBuildOptions, build_triangle_bvh, make_rays
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.io.procedural import (
        make_cornell_box, make_uv_sphere, merge_meshes,
    )
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.objrender import render_ao, render_aovs
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.pallas_packet import detect_specialization
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
    spec = detect_specialization(rays)

    # primary AOV pass only
    timeit("primary_aovs_ms", lambda: float(render_aovs(
        bvh, mesh, rays, None, max_leaf=8, scene8=s8,
        specialize=spec)[0]["depth"].min()))

    # occlusion megabatch only (2M fixed secondary rays, octant sort)
    R = 512 * 512 * 8
    rng = np.random.default_rng(5)
    org = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sec = make_rays(org, d)
    occ = jax.jit(lambda r: traverse_bvh8_sorted(
        s8, r, occlusion=True, octant_major=True, sub=8).hit)
    timeit("occlusion_2m_ms", lambda: float(
        occ(sec).astype(jnp.float32).min()))

    # full AO (the tracked config A)
    timeit("full_ao_ms", lambda: float(render_ao(
        bvh, mesh, rays, key, n_samples=8, max_leaf=8, scene8=s8,
        specialize=spec, octant_major=True, sub=8)[0]["ao"].min()))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(f"FATAL {type(e).__name__}: {e}")
        raise
