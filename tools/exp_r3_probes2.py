"""Stage-bisect the pt_fused Mosaic failure: compile progressively
larger slices of the megakernel (AOT, no chip). Each stage adds one
subsystem; the first failing stage localizes the unsupported op.

Run: python tools/exp_r3_probes2.py
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES = {}


def log(m):
    print(m, file=sys.stderr, flush=True)


def emit(k, v):
    RES[k] = v
    log(f"{k}: {v}")
    print(json.dumps(RES), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nanort_tpu.models import pt_fused as PF

    B, LN = 64, 128
    F, C, L = 32, 17, 2
    f32 = jnp.float32

    def mk(kern, n_in_tables=3):
        specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * (n_in_tables + 1)
        specs.append(pl.BlockSpec((6, 1, B, LN), lambda i: (0, i, 0, 0)))

        def call(meta, tri, face, light, rays6):
            return pl.pallas_call(
                kern,
                grid=(1,),
                in_specs=specs,
                out_specs=pl.BlockSpec((3, 1, B, LN),
                                       lambda i: (0, i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((3, 1, B, LN), f32),
            )(meta, tri, face, light, rays6)
        return call

    meta = jnp.zeros((1,), jnp.int32)
    tri = jnp.zeros((F, 12), f32)
    face = jnp.zeros((F, C), f32)
    light = jnp.zeros((L, 16), f32)
    rays6 = jnp.zeros((6, 1, B, LN), f32)

    def try_compile(tag, kern):
        try:
            jax.jit(mk(kern)).lower(meta, tri, face, light, rays6).compile()
            emit(tag, "ok")
        except Exception as e:
            emit(tag, f"{type(e).__name__}: {e}"[:120])

    def common(rays_ref):
        ox = rays_ref[0, 0]
        dx = rays_ref[3, 0]
        return ox, dx

    # S1: spp x bounce x tri-loop closest trace, i32 mask carries
    def s1(meta_ref, tri_ref, face_ref, light_ref, rays_ref, out_ref):
        zeros = jnp.zeros((B, LN), f32)
        izeros = jnp.zeros((B, LN), jnp.int32)
        ox = rays_ref[0, 0]
        oy = rays_ref[1, 0]
        oz = rays_ref[2, 0]
        dxx = rays_ref[3, 0]
        dyy = rays_ref[4, 0]
        dzz = rays_ref[5, 0]

        def trace(px, py, pz, dx, dy, dz, tmin, tmax):
            def body(i, c):
                t, fid, hit = c
                v0x = tri_ref[i, 0]
                e1x = tri_ref[i, 3]
                e2x = tri_ref[i, 6]
                tt = (px - v0x) * e1x + dx * e2x
                ok = (tt >= tmin) & (tt <= t)
                return (jnp.where(ok, tt, t),
                        jnp.where(ok, jnp.int32(i), fid),
                        jnp.where(ok, 1, hit))
            t, fid, hit = jax.lax.fori_loop(
                0, F, body, (tmax, izeros, izeros))
            return t, fid, hit != 0

        def bounce(b, s, st):
            px, py, pz, acc, alive_i = st
            alive = alive_i != 0
            tmax = jnp.where(alive, f32(1e30), f32(0.0))
            t, fid, hit = trace(px, py, pz, dxx, dyy, dzz,
                                jnp.full((B, LN), 0.001, f32), tmax)
            hit = hit & alive
            return (jnp.where(hit, px + t, px), py, pz,
                    acc + jnp.where(hit, t, 0.0),
                    (hit & (fid > 2)).astype(jnp.int32))

        def sample(s, acc3):
            a0, a1, a2 = acc3
            st = (ox, oy, oz, zeros,
                  jnp.ones((B, LN), jnp.int32))
            st = jax.lax.fori_loop(
                0, 8, lambda b, c: bounce(b, s, c), st)
            return (a0 + st[3], a1, a2)

        a0, a1, a2 = jax.lax.fori_loop(
            0, 4, sample, (zeros, zeros, zeros))
        out_ref[0, 0] = a0
        out_ref[1, 0] = a1
        out_ref[2, 0] = a2

    try_compile("s1_loops_trace", s1)

    # S2: + counter-hash RNG keyed on scalar loop arithmetic
    def s2(meta_ref, tri_ref, face_ref, light_ref, rays_ref, out_ref):
        zeros = jnp.zeros((B, LN), f32)
        seed = meta_ref[0]
        pid = pl.program_id(0)
        sub = jax.lax.broadcasted_iota(jnp.int32, (B, LN), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, LN), 1)
        ray_id = (pid * B + sub) * LN + lane
        ox = rays_ref[0, 0]

        def bounce(b, s, st):
            acc, = st
            base = seed + (s * 9 + b) * 16
            u0 = PF._uniform(ray_id, base + 0)
            u1 = PF._uniform(ray_id, base + 1)
            return (acc + jnp.where(u0 < 0.2, u1, 0.0),)

        def sample(s, acc3):
            a0, a1, a2 = acc3
            st = (ox,)
            st = jax.lax.fori_loop(0, 8, lambda b, c: bounce(b, s, c), st)
            return (a0 + st[0], a1, a2)

        a0, a1, a2 = jax.lax.fori_loop(0, 4, sample, (zeros, zeros, zeros))
        out_ref[0, 0] = a0
        out_ref[1, 0] = a1
        out_ref[2, 0] = a2

    try_compile("s2_rng", s2)

    # S3: + face-row select loop + sincos/onb/refract shading math
    def s3(meta_ref, tri_ref, face_ref, light_ref, rays_ref, out_ref):
        zeros = jnp.zeros((B, LN), f32)
        seed = meta_ref[0]
        sub = jax.lax.broadcasted_iota(jnp.int32, (B, LN), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, LN), 1)
        ray_id = sub * LN + lane
        ox = rays_ref[0, 0]

        def face_row(fid, cols):
            vals = [zeros] * len(cols)

            def body(i, vals):
                m = fid == i
                return tuple(jnp.where(m, face_ref[i, c], v)
                             for v, c in zip(vals, cols))
            return jax.lax.fori_loop(0, F, body, tuple(vals))

        def bounce(b, s, st):
            acc, = st
            base = seed + (s * 9 + b) * 16
            u = PF._uniform(ray_id, base)
            fid = (u * F).astype(jnp.int32)
            nx, ny, nz, kd = face_row(fid, [0, 1, 2, 3])
            cphi, sphi = PF._sincos_2pi(u, "poly")
            b1x, b1y, b1z, b2x, b2y, b2z = PF._onb(nx, ny, nz)
            d = b1x * cphi + b2x * sphi + nx * jnp.sqrt(
                jnp.maximum(1.0 - u, 0.0))
            return (acc + d * kd,)

        def sample(s, acc3):
            a0, a1, a2 = acc3
            st = (ox,)
            st = jax.lax.fori_loop(0, 8, lambda b, c: bounce(b, s, c), st)
            return (a0 + st[0], a1, a2)

        a0, a1, a2 = jax.lax.fori_loop(0, 4, sample, (zeros, zeros, zeros))
        out_ref[0, 0] = a0
        out_ref[1, 0] = a1
        out_ref[2, 0] = a2

    try_compile("s3_shade", s3)

    # S4: the real kernel, tiny static params
    kern = functools.partial(PF._pt_kernel, F, C, L, 4, 8, 3, "poly")
    try_compile("s4_full_poly", kern)
    kern2 = functools.partial(PF._pt_kernel, F, C, L, 4, 8, 3, "native")
    try_compile("s4_full_native", kern2)


if __name__ == "__main__":
    main()
