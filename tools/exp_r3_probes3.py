"""Stage-truncate the REAL pt_fused bounce body to find the op Mosaic
rejects. Full loop nest (traced spp/mb), full 14-carry, F=32; the body
is cut at increasing stages:

  1 rng + RR
  2 + closest trace (records)
  3 + face-row select
  4 + flip/inside/fresnel/lobe pick
  5 + NEE (light select + shadow trace + color add)
  6 + emission + next-direction (onb/sincos/refract) == full

Run: python tools/exp_r3_probes3.py
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nanort_tpu.models import pt_fused as PF

    B, LN = 64, 128
    F, C, L = 32, 17, 2
    f32 = jnp.float32

    def make_kernel(STAGE):
        def kern(meta_ref, tri_ref, face_ref, light_ref, rays_ref, out_ref):
            kfar = f32(1.0e30)
            eps_t = f32(0.001)
            ray_eps = f32(0.00001)
            pid = pl.program_id(0)
            seed = meta_ref[0]
            spp = meta_ref[1]
            max_bounces = meta_ref[2]
            ox0 = rays_ref[0, 0]
            oy0 = rays_ref[1, 0]
            oz0 = rays_ref[2, 0]
            dx0 = rays_ref[3, 0]
            dy0 = rays_ref[4, 0]
            dz0 = rays_ref[5, 0]
            sub = jax.lax.broadcasted_iota(jnp.int32, (B, LN), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, LN), 1)
            ray_id = (pid * B + sub) * LN + lane
            zeros = jnp.zeros((B, LN), f32)
            izeros = jnp.zeros((B, LN), jnp.int32)
            iones = jnp.ones((B, LN), jnp.int32)

            def trace(px, py, pz, dx, dy, dz, tmin, tmax, want_record):
                def body(i, c):
                    t, u, v, fid, hit = c
                    v0x = tri_ref[i, 0]
                    v0y = tri_ref[i, 1]
                    v0z = tri_ref[i, 2]
                    e1x = tri_ref[i, 3]
                    e1y = tri_ref[i, 4]
                    e1z = tri_ref[i, 5]
                    e2x = tri_ref[i, 6]
                    e2y = tri_ref[i, 7]
                    e2z = tri_ref[i, 8]
                    pvx, pvy, pvz = PF._cross3(dx, dy, dz, e2x, e2y, e2z)
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv = 1.0 / jnp.where(det == 0.0, f32(1.0), det)
                    tx = px - v0x
                    ty = py - v0y
                    tz = pz - v0z
                    uu = PF._dot3(tx, ty, tz, pvx, pvy, pvz) * inv
                    qx, qy, qz = PF._cross3(tx, ty, tz, e1x, e1y, e1z)
                    vv = PF._dot3(dx, dy, dz, qx, qy, qz) * inv
                    tt = PF._dot3(e2x, e2y, e2z, qx, qy, qz) * inv
                    ok = ((det != 0.0) & (uu >= 0.0) & (vv >= 0.0)
                          & (uu + vv <= 1.0) & (tt >= tmin) & (tt <= t))
                    hit = jnp.where(ok, 1, hit)
                    if want_record:
                        return (jnp.where(ok, tt, t), jnp.where(ok, uu, u),
                                jnp.where(ok, vv, v),
                                jnp.where(ok, jnp.int32(i), fid), hit)
                    return (jnp.where(ok, tt, t), u, v, fid, hit)

                t, u, v, fid, hit = jax.lax.fori_loop(
                    0, F, body, (tmax, zeros, zeros, izeros, izeros))
                return t, u, v, fid, hit != 0

            def face_row(fid, cols):
                vals = [zeros] * len(cols)

                def body(i, vals):
                    m = fid == i
                    return tuple(jnp.where(m, face_ref[i, c], v)
                                 for v, c in zip(vals, cols))
                return jax.lax.fori_loop(0, F, body, tuple(vals))

            def bounce(b, s, st):
                (px, py, pz, dx, dy, dz, cr, cg, cb, wr, wg, wb,
                 alive_i, do_em_i) = st
                alive = alive_i != 0
                do_em = do_em_i != 0
                base = seed + (s * (max_bounces + 1) + b) * 16

                rr_apply = b > 3
                u_rr = PF._uniform(ray_id, base + 0)
                killed = rr_apply & (u_rr < 0.2)
                alive = alive & ~killed
                rr_fac = jnp.where(rr_apply, f32(1.25), f32(1.0))
                wr = wr * rr_fac
                wg = wg * rr_fac
                wb = wb * rr_fac

                if STAGE >= 2:
                    tmax = jnp.where(alive, kfar, f32(0.0))
                    t, hu, hv, fid, hitf = trace(
                        px, py, pz, dx, dy, dz,
                        jnp.full((B, LN), eps_t, f32), tmax, True)
                    hit = hitf & alive
                else:
                    t = jnp.full((B, LN), 1.0, f32)
                    hu = hv = zeros
                    fid = izeros
                    hit = alive
                hx = px + dx * t
                hy = py + dy * t
                hz = pz + dz * t

                if STAGE >= 3:
                    rows = face_row(fid, list(range(17)))
                    (gnx, gny, gnz, kdx, kdy, kdz, kex, key_, kez,
                     ksx, ksy, ksz, ktx, kty, ktz, ior, dissolve) = rows
                    nx, ny, nz = gnx, gny, gnz
                else:
                    nx, ny, nz = zeros, zeros, zeros + 1.0
                    kdx = kdy = kdz = zeros + 0.5
                    kex = key_ = kez = zeros
                    ksx = ksy = ksz = zeros
                    ktx = kty = ktz = zeros
                    ior = zeros + 1.5
                    dissolve = zeros

                if STAGE >= 4:
                    onx, ony, onz = nx, ny, nz
                    facing = PF._dot3(nx, ny, nz, dx, dy, dz) > 0.0
                    nx = jnp.where(facing, -nx, nx)
                    ny = jnp.where(facing, -ny, ny)
                    nz = jnp.where(facing, -nz, nz)
                    inside = jnp.where(
                        PF._dot3(dx, dy, dz, onx, ony, onz) < 0.0,
                        f32(-1.0), f32(1.0))
                    n1 = jnp.where(inside < 0, 1.0 / ior, ior)
                    n2 = 1.0 / n1
                    r0 = (n1 - n2) / (n1 + n2)
                    r0 = r0 * r0
                    cth = 1.0 - PF._dot3(-dx, -dy, -dz, nx, ny, nz)
                    fres = r0 + (1.0 - r0) * cth * cth * cth * cth * cth
                    third = f32(1.0 / 3.0)
                    rho_s = (ksx + ksy + ksz) * third * fres
                    rho_d = (kdx + kdy + kdz) * third * (1.0 - fres) * (1.0 - dissolve)
                    rho_r = (ktx + kty + ktz) * third * (1.0 - fres) * dissolve
                    rho_e = (kex + key_ + kez) * third
                    total = rho_s + rho_d + rho_r + rho_e
                    absorbed = total < 1e-4
                    tot = jnp.where(absorbed, f32(1.0), total)
                    rho_s = rho_s / tot
                    rho_d = rho_d / tot
                    rho_r = rho_r / tot
                    rand = PF._uniform(ray_id, base + 1)
                    pick_s = rand < rho_s
                    pick_d = ~pick_s & (rand < rho_s + rho_d)
                    pick_r = ~pick_s & ~pick_d & (rand < rho_s + rho_d + rho_r)
                    pick_e = ~pick_s & ~pick_d & ~pick_r
                else:
                    onx, ony, onz = nx, ny, nz
                    inside = zeros + 1.0
                    n1 = zeros + 1.0
                    pick_s = jnp.zeros((B, LN), jnp.bool_)
                    pick_d = hit
                    pick_r = jnp.zeros((B, LN), jnp.bool_)
                    pick_e = jnp.zeros((B, LN), jnp.bool_)
                    absorbed = jnp.zeros((B, LN), jnp.bool_)

                if STAGE >= 5 and L > 0:
                    xi1 = PF._uniform(ray_id, base + 2)
                    xi2 = PF._uniform(ray_id, base + 3)
                    li = jnp.minimum((xi1 * L).astype(jnp.int32), L - 1)
                    xi1 = xi1 * L - li.astype(f32)
                    lvals = [zeros] * 16

                    def lsel(l, vals):
                        m = li == l
                        return tuple(jnp.where(m, light_ref[l, c], v)
                                     for c, v in enumerate(vals))
                    lvals = jax.lax.fori_loop(0, L, lsel, tuple(lvals))
                    (l0x, l0y, l0z, l1x, l1y, l1z, l2x, l2y, l2z,
                     lnx, lny, lnz, larea, lex, ley, lez) = lvals
                    srt = jnp.sqrt(xi1)
                    c0 = 1.0 - srt
                    c1 = srt * (1.0 - xi2)
                    c2 = srt * xi2
                    lpx = c0 * l0x + c1 * l1x + c2 * l2x
                    lpy = c0 * l0y + c1 * l1y + c2 * l2y
                    lpz = c0 * l0z + c1 * l1z + c2 * l2z
                    ldx = lpx - hx
                    ldy = lpy - hy
                    ldz = lpz - hz
                    ldx, ldy, ldz, ldist = PF._normalize3(ldx, ldy, ldz)
                    ok_l = ldist > 1e-6
                    cos_l = jnp.maximum(
                        -PF._dot3(ldx, ldy, ldz, lnx, lny, lnz), 0.0)
                    area_pdf = (f32(1.0 / L)) / jnp.maximum(larea, 1e-30)
                    lpdf = jnp.where(
                        ok_l & (cos_l > 1e-12),
                        area_pdf * ldist * ldist / jnp.maximum(cos_l, 1e-30),
                        f32(0.0))
                    shadow_max = jnp.maximum(ldist - ray_eps, 0.0)
                    nee_active = hit & pick_d & (lpdf > 0.0) & ~absorbed
                    _, _, _, _, sh_hit = trace(
                        hx, hy, hz, ldx, ldy, ldz,
                        jnp.full((B, LN), ray_eps, f32),
                        jnp.where(nee_active, shadow_max, f32(0.0)), False)
                    visible = ~sh_hit
                    cos_t = jnp.abs(PF._dot3(ldx, ldy, ldz, nx, ny, nz))
                    invpi = f32(1.0 / jnp.pi)
                    scale = cos_l * cos_t / jnp.maximum(lpdf, 1e-30)
                    gate = nee_active & visible
                    cr = cr + jnp.where(gate, kdx * invpi * lex * scale * wr, 0.0)
                    cg = cg + jnp.where(gate, kdy * invpi * ley * scale * wg, 0.0)
                    cb = cb + jnp.where(gate, kdz * invpi * lez * scale * wb, 0.0)

                if STAGE >= 6:
                    emit_gate = hit & pick_e & do_em & ~absorbed
                    cos_e = jnp.maximum(-PF._dot3(onx, ony, onz, dx, dy, dz), 0.0)
                    cr = cr + jnp.where(emit_gate, cos_e * kex * wr, 0.0)
                    cg = cg + jnp.where(emit_gate, cos_e * key_ * wg, 0.0)
                    cb = cb + jnp.where(emit_gate, cos_e * kez * wb, 0.0)
                    ddn = PF._dot3(dx, dy, dz, nx, ny, nz)
                    sx = dx - 2.0 * ddn * nx
                    sy = dy - 2.0 * ddn * ny
                    sz = dz - 2.0 * ddn * nz
                    u1 = PF._uniform(ray_id, base + 4)
                    cphi, sphi = PF._sincos_2pi(
                        PF._uniform(ray_id, base + 5), "poly")
                    rr_ = jnp.sqrt(u1)
                    cdx_ = rr_ * cphi
                    cdy_ = rr_ * sphi
                    cdz_ = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
                    b1x, b1y, b1z, b2x, b2y, b2z = PF._onb(nx, ny, nz)
                    ddx = b1x * cdx_ + b2x * cdy_ + nx * cdz_
                    ddy = b1y * cdx_ + b2y * cdy_ + ny * cdz_
                    ddz = b1z * cdx_ + b2z * cdy_ + nz * cdz_
                    rnx = -inside * onx
                    rny = -inside * ony
                    rnz = -inside * onz
                    ndi = PF._dot3(rnx, rny, rnz, dx, dy, dz)
                    kk = 1.0 - n1 * n1 * (1.0 - ndi * ndi)
                    kroot = jnp.sqrt(jnp.maximum(kk, 0.0))
                    rxx = n1 * dx - (n1 * ndi + kroot) * rnx
                    rxy = n1 * dy - (n1 * ndi + kroot) * rny
                    rxz = n1 * dz - (n1 * ndi + kroot) * rnz
                    tir = kk < 0.0
                    rxx = jnp.where(tir, 0.0, rxx)
                    rxy = jnp.where(tir, 0.0, rxy)
                    rxz = jnp.where(tir, 0.0, rxz)
                    ndx = jnp.where(pick_s, sx, jnp.where(pick_d, ddx, rxx))
                    ndy = jnp.where(pick_s, sy, jnp.where(pick_d, ddy, rxy))
                    ndz = jnp.where(pick_s, sz, jnp.where(pick_d, ddz, rxz))
                    lwx = jnp.where(pick_s, ksx, jnp.where(pick_d, kdx, ktx))
                    lwy = jnp.where(pick_s, ksy, jnp.where(pick_d, kdy, kty))
                    lwz = jnp.where(pick_s, ksz, jnp.where(pick_d, kdz, ktz))
                    wr = wr * jnp.where(hit, lwx, 1.0)
                    wg = wg * jnp.where(hit, lwy, 1.0)
                    wb = wb * jnp.where(hit, lwz, 1.0)
                else:
                    ndx, ndy, ndz = -dx, -dy, -dz
                    cr = cr + jnp.where(hit, wr * 0.01, 0.0)

                alive = hit & ~pick_e & ~absorbed
                do_em = jnp.where(hit, ~pick_d, do_em)
                return (jnp.where(hit, hx, px), jnp.where(hit, hy, py),
                        jnp.where(hit, hz, pz),
                        jnp.where(hit, ndx, dx), jnp.where(hit, ndy, dy),
                        jnp.where(hit, ndz, dz),
                        cr, cg, cb, wr, wg, wb,
                        alive.astype(jnp.int32), do_em.astype(jnp.int32))

            def sample(s, acc):
                ar, ag, ab = acc
                st = (ox0, oy0, oz0, dx0, dy0, dz0,
                      zeros, zeros, zeros,
                      jnp.ones((B, LN), f32), jnp.ones((B, LN), f32),
                      jnp.ones((B, LN), f32), iones, iones)
                st = jax.lax.fori_loop(
                    0, max_bounces, lambda b, c: bounce(b, s, c), st)
                return (ar + st[6], ag + st[7], ab + st[8])

            ar, ag, ab = jax.lax.fori_loop(0, spp, sample, (zeros, zeros, zeros))
            out_ref[0, 0] = ar
            out_ref[1, 0] = ag
            out_ref[2, 0] = ab
        return kern

    meta = jnp.asarray([7, 4, 8], jnp.int32)
    tri = jnp.zeros((F, 12), f32)
    face = jnp.zeros((F, C), f32)
    light = jnp.zeros((L, 16), f32)
    rays6 = jnp.zeros((6, 1, B, LN), f32)
    RES = {}
    for stage in (1, 2, 3, 4, 5, 6):
        kern = make_kernel(stage)
        try:
            jax.jit(lambda m, t, f, l, r: pl.pallas_call(
                kern, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4 +
                         [pl.BlockSpec((6, 1, B, LN), lambda i: (0, i, 0, 0))],
                out_specs=pl.BlockSpec((3, 1, B, LN), lambda i: (0, i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((3, 1, B, LN), f32),
            )(m, t, f, l, r)).lower(meta, tri, face, light, rays6).compile()
            RES[f"stage{stage}"] = "ok"
        except Exception as e:
            RES[f"stage{stage}"] = f"{type(e).__name__}"[:40]
        log(f"stage{stage}: {RES[f'stage{stage}']}")
        print(json.dumps(RES), flush=True)


if __name__ == "__main__":
    main()
