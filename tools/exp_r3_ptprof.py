"""Round-3: piecewise profile of one path-tracer bounce at megabatch
scale (R = 6.5M rays, Cornell 32 tris) — where do 1347 ms/bounce go?

Each piece is its own jit with a scalar readback. Pieces: RNG draws,
closest brute trace, shadow brute trace, per-face gathers (faces ->
verts -> normal), per-material gathers, light sampling, the fused
everything-else elementwise block.

Run: nohup python tools/exp_r3_ptprof.py > tools/logs/exp_r3_ptprof.out 2> tools/logs/exp_r3_ptprof.log &
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


def timeit(tag, fn, n=2):
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

    from nanort_tpu.io.procedural import make_cornell_pt_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models.path_tracer import make_pt_scene, _sample_light
    from nanort_tpu.traverse.brute import brute_force_traverse
    from nanort_tpu.core.ray import Rays

    sv, sf, mids, mats = make_pt_scene, None, None, None
    sv, sf, mids, mats = make_cornell_pt_scene(2.0)
    scene = make_pt_scene(sv, sf, mids, mats)
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=512, height=512, fov=45.0)
    prays = pinhole_rays(cam)
    n = 25
    org = prays.org.reshape(-1, 3)
    d = prays.dir.reshape(-1, 3)
    R0 = org.shape[0]
    org = jnp.broadcast_to(org[None], (n, R0, 3)).reshape(-1, 3)
    d = jnp.broadcast_to(d[None], (n, R0, 3)).reshape(-1, 3)
    R = R0 * n
    jax.block_until_ready(org)
    log(f"R = {R}")
    key = jax.random.PRNGKey(3)
    f32 = jnp.float32

    # --- RNG: the per-bounce draws (3x uniform (R,) + cosine_dir 2x) ---
    @jax.jit
    def rng_piece(k):
        a = jax.random.uniform(jax.random.fold_in(k, 10), (R,), f32)
        b = jax.random.uniform(jax.random.fold_in(k, 11), (R,), f32)
        c = jax.random.uniform(jax.random.fold_in(k, 12), (R, 2), f32)
        e = jax.random.uniform(jax.random.fold_in(k, 13), (R, 2), f32)
        return (a + b + c.sum(-1) + e.sum(-1)).min()

    timeit("rng_ms", lambda: float(rng_piece(key)))

    # --- closest + shadow brute traces ---
    chunk = int(min(512, max(4, (1 << 26) // R)))
    log(f"brute chunk = {chunk}")

    @jax.jit
    def closest(o, dd):
        r = Rays(org=o, dir=dd, min_t=jnp.full((R,), 1e-3, f32),
                 max_t=jnp.full((R,), 1e30, f32))
        h = brute_force_traverse(scene.mesh, r, chunk_size=chunk)
        return h.t.min()

    timeit("brute_closest_ms", lambda: float(closest(org, d)))

    # --- per-face gathers (faces -> verts -> geometric normal) ---
    fid = jnp.zeros((R,), jnp.int32)

    @jax.jit
    def face_gather(fid):
        f = jnp.take(scene.mesh.faces, fid, axis=0)
        tri = jnp.take(scene.mesh.vertices, f, axis=0)
        norm = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        return norm.min()

    timeit("face_gather_ms", lambda: float(face_gather(fid)))

    # --- per-material gathers ---
    @jax.jit
    def mat_gather(fid):
        mid = jnp.take(scene.material_ids, fid)
        s = 0.0
        for t in (scene.materials.diffuse, scene.materials.emission,
                  scene.materials.specular, scene.materials.transmittance):
            s = s + jnp.take(t, mid, axis=0).min()
        s = s + jnp.take(scene.materials.ior, mid).min()
        s = s + jnp.take(scene.materials.dissolve, mid).min()
        return s

    timeit("mat_gather_ms", lambda: float(mat_gather(fid)))

    # --- light sampling ---
    @jax.jit
    def light(k, p):
        ldir, ldist, lpdf, lrad = _sample_light(scene, k, p)
        return ldir.min() + ldist.min() + lpdf.min() + lrad.min()

    timeit("light_sample_ms", lambda: float(light(key, org)))

    # --- elementwise everything-else proxy: ~40 (R,3) ops ---
    @jax.jit
    def elem(o, dd):
        x = o
        for _ in range(20):
            x = x * 1.0001 + dd
            x = jnp.where((x[:, :1] > 0), x, -x)
        return x.min()

    timeit("elementwise40_ms", lambda: float(elem(org, d)))


if __name__ == "__main__":
    main()
