"""Round-3: decompose the config-B bounce marginal (1087 ms at R=6.5M).

The ptprof component sum (~500 ms: 2x brute trace 170 + rng 33 + table
lookups + elementwise) is ~half the measured in-loop marginal, so this
runs a LOCAL copy of the trace_paths bounce with knockout flags, timing
the b=1 vs b=5 marginal per variant:

  full        everything (should reproduce ~1087 ms/bounce)
  no_shadow   NEE shadow trace replaced by visible=True
  no_closest  closest trace replaced by a synthetic fixed hit
  no_trace    both knocked out (pure shading+rng+state cost)
  trace_only  both traces, shading replaced by trivial state update

plus out-of-loop brute-force variants (chunk=10 carry-scan vs one
32-tri chunk vs 32-tri chunk with lax.map ray tiles) to see whether the
chunked carry scan is what makes in-loop tracing expensive.

Run: nohup python tools/exp_r3_ptdecomp.py > tools/logs/exp_r3_ptdecomp.out 2> tools/logs/exp_r3_ptdecomp.log &
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


RES = {}


def emit(tag, val):
    RES[tag] = val
    log(f"{tag}: {val}")
    print(json.dumps(RES), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanort_tpu.io.procedural import make_cornell_pt_scene
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.models import path_tracer as PT
    from nanort_tpu.models.path_tracer import make_pt_scene, _trace, _rows_by_id

    sv, sf, mids, mats = make_cornell_pt_scene(2.0)
    pts = make_pt_scene(sv, sf, mids, mats)
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=512, height=512, fov=45.0)
    prays = pinhole_rays(cam)
    org = prays.org.reshape(-1, 3)
    d = prays.dir.reshape(-1, 3)
    R0 = org.shape[0]
    n = 25
    org_all = jnp.broadcast_to(org[None], (n, R0, 3)).reshape(-1, 3)
    dir_all = jnp.broadcast_to(d[None], (n, R0, 3)).reshape(-1, 3)
    jax.block_until_ready(org_all)
    R = org_all.shape[0]
    pkey = jax.random.PRNGKey(3)
    f32 = jnp.float32
    kfar = f32(1.0e30)
    eps_t = f32(0.001)
    ray_eps = f32(0.00001)

    # ---- local bounce loop with knockouts (mirrors trace_paths) ----
    @functools.partial(jax.jit, static_argnames=(
        "max_bounces", "do_closest", "do_shadow", "do_shade"))
    def paths(org0, dir0, key, max_bounces, do_closest=True,
              do_shadow=True, do_shade=True):
        state = dict(
            org=org0.astype(f32), dir=dir0.astype(f32),
            color=jnp.zeros((R, 3), f32), weight=jnp.ones((R, 3), f32),
            alive=jnp.ones((R,), bool), do_emission=jnp.ones((R,), bool),
        )

        def bounce(b, st):
            k = jax.random.fold_in(key, b)
            alive = st["alive"]
            U = jax.random.uniform(jax.random.fold_in(k, 9), (R, 6), f32)
            rr_apply = b > 3
            killed = rr_apply & (U[:, 0] < 0.2)
            alive = alive & ~killed
            weight = st["weight"] * jnp.where(rr_apply, 1.25, 1.0)

            if do_closest:
                hits = _trace(pts, st["org"], st["dir"],
                              jnp.full((R,), eps_t, f32),
                              jnp.where(alive, kfar, f32(0.0)), 8192)
                hit = hits.hit & alive
                h_t, h_u, h_v = hits.t, hits.u, hits.v
                fid = jnp.where(hit, hits.prim_id, 0).astype(jnp.int32)
            else:
                hit = alive
                h_t = jnp.full((R,), 1.0, f32)
                h_u = jnp.full((R,), 0.25, f32)
                h_v = jnp.full((R,), 0.25, f32)
                fid = (jax.lax.iota(jnp.int32, R) % 32)

            p = st["org"] + st["dir"] * h_t[..., None]

            if do_shade:
                rows = _rows_by_id(pts.face_table, fid)
                norm = rows[:, 0:3]
                mat_d = rows[:, 3:6]
                mat_e = rows[:, 6:9]
                mat_s = rows[:, 9:12]
                mat_r = rows[:, 12:15]
                ior = rows[:, 15]
                dissolve = rows[:, 16]

                original_norm = norm
                facing = jnp.sum(norm * st["dir"], -1) > 0
                norm = jnp.where(facing[..., None], -norm, norm)
                inside = jnp.where(
                    jnp.sum(st["dir"] * original_norm, -1) < 0, -1.0, 1.0)
                n1 = jnp.where(inside < 0, 1.0 / ior, ior)
                n2 = 1.0 / n1
                fres = PT._fresnel_schlick(
                    -st["dir"], norm, (n1 - n2) / (n1 + n2))
                rho_s = PT._luma(mat_s) * fres
                rho_d = PT._luma(mat_d) * (1.0 - fres) * (1.0 - dissolve)
                rho_r = PT._luma(mat_r) * (1.0 - fres) * dissolve
                rho_e = PT._luma(mat_e)
                total = rho_s + rho_d + rho_r + rho_e
                absorbed = total < 1e-4
                tot = jnp.where(absorbed, 1.0, total)
                rho_s, rho_d, rho_r = rho_s / tot, rho_d / tot, rho_r / tot
                rand = U[:, 1]
                pick_s = rand < rho_s
                pick_d = ~pick_s & (rand < rho_s + rho_d)
                pick_r = ~pick_s & ~pick_d & (rand < rho_s + rho_d + rho_r)
                pick_e = ~pick_s & ~pick_d & ~pick_r

                ldir, ldist, lpdf, lrad = PT._sample_light(
                    pts, jax.random.fold_in(k, 12), p, u2=U[:, 2:4])
                shadow_max = jnp.maximum(ldist - ray_eps, 0.0)
                nee_active = hit & pick_d & (lpdf > 0.0) & ~absorbed
            else:
                mat_d = jnp.ones((R, 3), f32)
                mat_e = jnp.zeros((R, 3), f32)
                norm = original_norm = jnp.broadcast_to(
                    jnp.array([0, 0, 1], f32), (R, 3))
                inside = jnp.ones((R,), f32)
                n1 = jnp.ones((R,), f32)
                pick_s = jnp.zeros((R,), bool)
                pick_d = jnp.ones((R,), bool)
                pick_r = pick_e = jnp.zeros((R,), bool)
                absorbed = jnp.zeros((R,), bool)
                ldir = jnp.broadcast_to(jnp.array([0, 1, 0], f32), (R, 3))
                shadow_max = jnp.full((R,), 1.0, f32)
                lpdf = jnp.ones((R,), f32)
                lrad = jnp.ones((R, 3), f32)
                nee_active = hit

            if do_shadow:
                sh = _trace(pts, p, ldir, jnp.full((R,), ray_eps, f32),
                            jnp.where(nee_active, shadow_max, f32(0.0)),
                            8192, occlusion=True)
                visible = ~sh.hit
            else:
                visible = jnp.ones((R,), bool)

            if do_shade:
                cos_t = jnp.abs(jnp.sum(ldir * norm, -1))
                direct = (mat_d / jnp.pi) * lrad * (
                    cos_t / jnp.maximum(lpdf, 1e-30))[..., None]
                color = st["color"] + jnp.where(
                    (nee_active & visible)[..., None], direct * weight, 0.0)
                emit_gate = hit & pick_e & st["do_emission"] & ~absorbed
                cos_e = jnp.maximum(
                    jnp.sum(original_norm * -st["dir"], -1), 0.0)
                color = color + jnp.where(
                    emit_gate[..., None], cos_e[..., None] * mat_e * weight, 0.0)
                out_s = PT._reflect(st["dir"], norm)
                out_d = PT._cosine_dir(jax.random.fold_in(k, 13), norm,
                                       u2=U[:, 4:6])
                out_r = PT._refract(
                    st["dir"], -inside[..., None] * original_norm, n1)
                new_dir = jnp.where(
                    pick_s[..., None], out_s,
                    jnp.where(pick_d[..., None], out_d, out_r))
                lobe_w = jnp.where(
                    pick_s[..., None], mat_s,
                    jnp.where(pick_d[..., None], mat_d, mat_r))
                weight = weight * jnp.where(hit[..., None], lobe_w, 1.0)
                alive = hit & ~pick_e & ~absorbed
                do_em = jnp.where(pick_d, False, True)
            else:
                color = st["color"] + jnp.where(
                    visible[..., None], weight * 0.01, 0.0)
                new_dir = jnp.where(hit[..., None], -st["dir"], st["dir"])
                alive = hit
                do_em = st["do_emission"]

            return dict(
                org=jnp.where(hit[..., None], p, st["org"]),
                dir=jnp.where(hit[..., None], new_dir, st["dir"]),
                color=color, weight=weight, alive=alive,
                do_emission=jnp.where(hit, do_em, st["do_emission"]),
            )

        st = jax.lax.fori_loop(0, max_bounces, bounce, state)
        return st["color"]

    def marginal(tag, **kw):
        ts = {}
        for mb in (1, 5):
            def run():
                c = paths(org_all, dir_all, pkey, mb, **kw)
                return float(c.min())
            run()
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            ts[mb] = best
        emit(tag + "_marg_ms", round((ts[5] - ts[1]) / 4 * 1e3))

    marginal("full")
    marginal("no_shadow", do_shadow=False)
    marginal("no_closest", do_closest=False)
    marginal("no_trace", do_closest=False, do_shadow=False)
    marginal("trace_only", do_shade=False)
    marginal("rng_state_only", do_closest=False, do_shadow=False,
             do_shade=False)

    # ---- out-of-loop brute variants ----
    from nanort_tpu.core.ray import Rays
    from nanort_tpu.traverse.brute import brute_force_traverse

    rays = Rays(org=org_all, dir=dir_all,
                min_t=jnp.full((R,), eps_t, f32),
                max_t=jnp.full((R,), kfar, f32))

    for tag, chunk in (("brute_c10", 10), ("brute_c32", 32)):
        def run():
            h = brute_force_traverse(pts.mesh, rays, chunk_size=chunk)
            return float(h.t.min())
        run()
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        emit(tag + "_ms", round(best * 1e3))

    # 32-tri single chunk, rays tiled with lax.map so the (tile, 32)
    # intermediates stay small while the tri axis is unchunked
    for tag, tile in (("brute_map1m", 1 << 20), ("brute_map4m", 1 << 22)):
        @jax.jit
        def tiled(org, d, mint, maxt):
            def one(args):
                o, dd, mn, mx = args
                return brute_force_traverse(
                    pts.mesh, Rays(org=o, dir=dd, min_t=mn, max_t=mx),
                    chunk_size=32)
            nt = R // tile
            sh = lambda a: a.reshape((nt, tile) + a.shape[1:])
            return jax.lax.map(
                one, (sh(org_all), sh(dir_all), sh(rays.min_t), sh(rays.max_t)))

        def run():
            h = tiled(org_all, dir_all, rays.min_t, rays.max_t)
            return float(h.t.min())
        try:
            run()
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            emit(tag + "_ms", round(best * 1e3))
        except Exception as e:
            emit(tag + "_err", f"{type(e).__name__}")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        log(f"FATAL {type(e).__name__}: {e}")
        raise
