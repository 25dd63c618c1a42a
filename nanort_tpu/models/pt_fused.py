"""Fused path-tracer megakernel for small (brute-force-class) scenes.

The ENTIRE render — the spp loop, the bounce loop, closest-hit, NEE
shadow rays, light sampling, shading, and the RNG — runs inside ONE
Pallas kernel invocation per ray block. Between bounces nothing touches
HBM: all path state lives in VMEM registers/tiles, the triangle soup and
the shading/light tables sit in SMEM scalars, and each block accumulates
its pixels' radiance across every sample before writing one (3, 64, 128)
tile out. This is the "bounce loop becomes a jitted wavefront megakernel"
design (SURVEY.md §3.4) taken to its end point for scenes whose geometry
fits on-core; the XLA megabatch path (`trace_paths`) remains the general
engine for scenes that don't.

Semantics mirror `trace_paths` (which itself mirrors the reference's
path_tracer/main.cc:785-1009: Russian roulette at main.cc:828-838, NEE +
MeshLight::sampleDirect at main.cc:336-397/938-957, lobe pick and
emission gating at main.cc:899-971), with two deliberate deviations, both
within Monte-Carlo tolerance:

- the closest-hit test is Möller–Trumbore on precomputed (v0, e1, e2)
  rows rather than the watertight test (ulp-level t/u/v differences;
  accept condition ``tt >= min_t & tt <= t_cur`` with replace-on-<= is
  preserved so equal-t prim selection matches the brute oracle), and
- uniforms come from a counter-based lowbias32 hash keyed on
  (ray_id, sample, bounce, draw) instead of threefry — a different but
  equidistributed stream, deterministic per seed, identical in interpret
  mode and on hardware (pltpu.prng_* does not interpret on CPU).

Eligibility: face_table present (F <= PT_FUSED_MAX_TRIS so the SMEM
tables stay small). Facevarying normals (the 26-column table) are
supported via nine extra per-face select lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# SMEM budget cap: tri rows (F,9) + face table (F,26) at f32 stay ~35KB.
PT_FUSED_MAX_TRIS = 256

_BLK_SUB, _BLK_LANE = 64, 128
_BLK = _BLK_SUB * _BLK_LANE


def _sr(x, n):
    # np.int32 shift count: a bare Python int is int64 under x64 and
    # lax.shift_right_logical does not promote
    return jax.lax.shift_right_logical(x, np.int32(n))


# lowbias32 multipliers as plain ints (0x7feb352d; 0x846ca68b wrapped to
# int32) — jnp constants would be captured as pallas kernel constants.
_H1 = 0x7FEB352D
_H2 = -2073352565


def _hash32(x):
    x = x ^ _sr(x, 16)
    x = x * _H1
    x = x ^ _sr(x, 15)
    x = x * _H2
    x = x ^ _sr(x, 16)
    return x


def _uniform(ray_id, ctr):
    """U[0,1) from hash(ray_id, counter); int32 wraparound is the mixer."""
    h = _hash32(ray_id ^ _hash32(ctr))
    return _sr(h, 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _normalize3(x, y, z, eps=1e-30):
    n = jnp.sqrt(x * x + y * y + z * z)
    inv = 1.0 / jnp.maximum(n, eps)
    return x * inv, y * inv, z * inv, n


def _sincos_2pi_poly(u):
    """(cos(2*pi*u), sin(2*pi*u)) for u in [0,1) without trig ops:
    quadrant reduction + degree-8/9 Taylor on [0, pi/2) (max err ~4e-6,
    invisible under Monte-Carlo noise). Fallback for Mosaic targets
    where jnp.sin/cos do not lower."""
    t4 = u * 4.0
    q = jnp.floor(t4)
    y = (t4 - q) * jnp.float32(jnp.pi / 2)
    y2 = y * y
    s = y * (1.0 + y2 * (jnp.float32(-1 / 6) + y2 * (
        jnp.float32(1 / 120) + y2 * (jnp.float32(-1 / 5040)
                                     + y2 * jnp.float32(1 / 362880)))))
    c = 1.0 + y2 * (jnp.float32(-0.5) + y2 * (
        jnp.float32(1 / 24) + y2 * (jnp.float32(-1 / 720)
                                    + y2 * jnp.float32(1 / 40320))))
    qi = q.astype(jnp.int32) & 3
    cosv = jnp.where(qi == 0, c, jnp.where(qi == 1, -s,
                                           jnp.where(qi == 2, -c, s)))
    sinv = jnp.where(qi == 0, s, jnp.where(qi == 1, c,
                                           jnp.where(qi == 2, -s, -c)))
    return cosv, sinv


def _sincos_2pi(u, trig):
    if trig == "native":
        a = u * jnp.float32(2.0 * jnp.pi)
        return jnp.cos(a), jnp.sin(a)
    return _sincos_2pi_poly(u)


def _onb(nx, ny, nz):
    """Revised ONB, both sign branches via select (main.cc:216-229;
    matches path_tracer._revised_onb with the selected `a` factored)."""
    neg = nz < 0.0
    a = 1.0 / jnp.where(neg, 1.0 - nz, 1.0 + nz)
    b = nx * ny * a
    b1x = 1.0 - nx * nx * a
    b1y = -b
    b1z = jnp.where(neg, nx, -nx)
    b2x = jnp.where(neg, b, -b)
    b2y = jnp.where(neg, ny * ny * a - 1.0, 1.0 - ny * ny * a)
    b2z = -ny
    return b1x, b1y, b1z, b2x, b2y, b2z


def _bounce_step(ray_id, base, st, t, hu, hv, hitf, alive,
                 nx0, ny0, nz0, kdx, kdy, kdz, kex, key_, kez,
                 ksx, ksy, ksz, ktx, kty, ktz, ior, dissolve,
                 L, light_ref, trig, shadow_trace, zeros,
                 az_wedge=None, az_strata=1):
    """Shading + NEE + emission + next-direction for one bounce, given
    the closest-hit record and the hit lane's material values. Factored
    so the brute-force and BVH-traced fused kernels share every op
    (reference semantics: path_tracer/main.cc:785-1009; see module
    docstring for the deliberate deviations).

    ``nx0/ny0/nz0`` is the (already interpolated + normalized, unflipped)
    shading normal; ``shadow_trace(hx, hy, hz, dx, dy, dz, smax)`` must
    return an int32 any-hit mask for rays with window (ray_eps, smax].
    """
    f32 = jnp.float32
    ray_eps = f32(0.00001)
    (px, py, pz, dx, dy, dz, cr, cg, cb, wr, wg, wb,
     _alive_i, do_em_i) = st
    hit = hitf & alive

    hx = px + dx * t
    hy = py + dy * t
    hz = pz + dz * t

    onx, ony, onz = nx0, ny0, nz0  # original (unflipped) normal
    facing = _dot3(nx0, ny0, nz0, dx, dy, dz) > 0.0
    nx = jnp.where(facing, -nx0, nx0)
    ny = jnp.where(facing, -ny0, ny0)
    nz = jnp.where(facing, -nz0, nz0)

    inside = jnp.where(_dot3(dx, dy, dz, onx, ony, onz) < 0.0,
                       f32(-1.0), f32(1.0))
    n1 = jnp.where(inside < 0, 1.0 / ior, ior)
    n2 = 1.0 / n1
    r0 = (n1 - n2) / (n1 + n2)
    r0 = r0 * r0
    cth = 1.0 - _dot3(-dx, -dy, -dz, nx, ny, nz)
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

    rand = _uniform(ray_id, base + 1)
    pick_s = rand < rho_s
    pick_d = ~pick_s & (rand < rho_s + rho_d)
    pick_r = ~pick_s & ~pick_d & (rand < rho_s + rho_d + rho_r)
    pick_e = ~pick_s & ~pick_d & ~pick_r

    # ---- NEE (MeshLight::sampleDirect, main.cc:336-397) ----
    if L > 0:
        xi1 = _uniform(ray_id, base + 2)
        xi2 = _uniform(ray_id, base + 3)
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
        ldx, ldy, ldz, ldist = _normalize3(ldx, ldy, ldz)
        ok_l = ldist > 1e-6
        cos_l = jnp.maximum(
            -_dot3(ldx, ldy, ldz, lnx, lny, lnz), 0.0)
        area_pdf = (f32(1.0 / L)) / jnp.maximum(larea, 1e-30)
        lpdf = jnp.where(
            ok_l & (cos_l > 1e-12),
            area_pdf * ldist * ldist / jnp.maximum(cos_l, 1e-30),
            f32(0.0))
        shadow_max = jnp.maximum(ldist - ray_eps, 0.0)
        nee_active = hit & pick_d & (lpdf > 0.0) & ~absorbed
        sh_hit = shadow_trace(
            hx, hy, hz, ldx, ldy, ldz,
            jnp.where(nee_active, shadow_max, f32(0.0)))
        visible = sh_hit == 0
        cos_t = jnp.abs(_dot3(ldx, ldy, ldz, nx, ny, nz))
        invpi = f32(1.0 / jnp.pi)
        scale = cos_l * cos_t / jnp.maximum(lpdf, 1e-30)
        gate = nee_active & visible
        cr = cr + jnp.where(gate, kdx * invpi * lex * scale * wr, 0.0)
        cg = cg + jnp.where(gate, kdy * invpi * ley * scale * wg, 0.0)
        cb = cb + jnp.where(gate, kdz * invpi * lez * scale * wb, 0.0)

    # ---- emission (main.cc:964-971) ----
    emit_gate = hit & pick_e & (do_em_i != 0) & ~absorbed
    cos_e = jnp.maximum(-_dot3(onx, ony, onz, dx, dy, dz), 0.0)
    cr = cr + jnp.where(emit_gate, cos_e * kex * wr, 0.0)
    cg = cg + jnp.where(emit_gate, cos_e * key_ * wg, 0.0)
    cb = cb + jnp.where(emit_gate, cos_e * kez * wb, 0.0)

    # ---- next direction ----
    ddn = _dot3(dx, dy, dz, nx, ny, nz)
    sx = dx - 2.0 * ddn * nx
    sy = dy - 2.0 * ddn * ny
    sz = dz - 2.0 * ddn * nz

    u1 = _uniform(ray_id, base + 4)
    u2 = _uniform(ray_id, base + 5)
    if az_wedge is not None:
        # block-shared azimuth wedge: every lane of this (sample, bounce)
        # draws phi inside the same 1/az_strata wedge (az_wedge is a
        # scalar that cycles over wedges with the sample index, so each
        # PIXEL's azimuth marginal stays uniform — stratified, unbiased).
        # The point is traversal coherence: diffuse bounce packets share
        # a direction cone instead of the full hemisphere, shrinking the
        # shared-stack union the fused tracer visits.
        u2 = (az_wedge.astype(jnp.float32) + u2) / f32(az_strata)
    cphi, sphi = _sincos_2pi(u2, trig)
    rr_ = jnp.sqrt(u1)
    cdx_ = rr_ * cphi
    cdy_ = rr_ * sphi
    cdz_ = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    b1x, b1y, b1z, b2x, b2y, b2z = _onb(nx, ny, nz)
    ddx = b1x * cdx_ + b2x * cdy_ + nx * cdz_
    ddy = b1y * cdx_ + b2y * cdy_ + ny * cdz_
    ddz = b1z * cdx_ + b2z * cdy_ + nz * cdz_

    rnx = -inside * onx
    rny = -inside * ony
    rnz = -inside * onz
    ndi = _dot3(rnx, rny, rnz, dx, dy, dz)
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

    alive_out = hit & ~pick_e & ~absorbed
    # do_em stays int32 the whole way: a select with i1 operands
    # lowers through an i8->i1 trunci Mosaic rejects
    do_em_i = jnp.where(hit, (~pick_d).astype(jnp.int32), do_em_i)

    return (jnp.where(hit, hx, px), jnp.where(hit, hy, py),
            jnp.where(hit, hz, pz),
            jnp.where(hit, ndx, dx), jnp.where(hit, ndy, dy),
            jnp.where(hit, ndz, dz),
            cr, cg, cb, wr, wg, wb,
            alive_out.astype(jnp.int32), do_em_i)


def _pt_kernel(F, C, L, rr_start, trig, az_strata,
               meta_ref, tri_ref, face_ref, light_ref, rays_ref, out_ref):
    f32 = jnp.float32
    kfar = f32(1.0e30)
    eps_t = f32(0.001)
    ray_eps = f32(0.00001)

    pid = pl.program_id(0)
    seed = meta_ref[0]
    # spp and max_bounces ride SMEM as TRACED loop bounds: with static
    # bounds Mosaic unrolls the spp x bounce nest and the program blows
    # a compiler limit at max_bounces >= ~2 (tools/exp_r3_probes2.py);
    # traced bounds keep the nest a real loop AND make every (spp,
    # bounces) setting share one compiled kernel
    spp = meta_ref[1]
    max_bounces = meta_ref[2]

    ox0 = rays_ref[0, 0]
    oy0 = rays_ref[1, 0]
    oz0 = rays_ref[2, 0]
    dx0 = rays_ref[3, 0]
    dy0 = rays_ref[4, 0]
    dz0 = rays_ref[5, 0]

    sub = jax.lax.broadcasted_iota(jnp.int32, (_BLK_SUB, _BLK_LANE), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_BLK_SUB, _BLK_LANE), 1)
    ray_id = (pid * _BLK_SUB + sub) * _BLK_LANE + lane

    zeros = jnp.zeros((_BLK_SUB, _BLK_LANE), f32)
    # Mosaic can't carry i1 vectors through fori_loop (probe-verified:
    # tools/exp_r3_probes.py "boolcarry") — masks ride loops as int32
    izeros = jnp.zeros((_BLK_SUB, _BLK_LANE), jnp.int32)
    iones = jnp.ones((_BLK_SUB, _BLK_LANE), jnp.int32)

    def trace(px, py, pz, dx, dy, dz, tmin, tmax, want_record):
        """Brute MT sweep over all F tris; replace-on-<= (last prim wins
        ties, matching ops/triangle.py:172). `hit` carries as int32."""
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
            pvx, pvy, pvz = _cross3(dx, dy, dz, e2x, e2y, e2z)
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv = 1.0 / jnp.where(det == 0.0, f32(1.0), det)
            tx = px - v0x
            ty = py - v0y
            tz = pz - v0z
            uu = _dot3(tx, ty, tz, pvx, pvy, pvz) * inv
            qx, qy, qz = _cross3(tx, ty, tz, e1x, e1y, e1z)
            vv = _dot3(dx, dy, dz, qx, qy, qz) * inv
            tt = _dot3(e2x, e2y, e2z, qx, qy, qz) * inv
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
        """Select face-table columns for each lane's fid (row 0 for
        misses, as the XLA path's ``where(hit, prim, 0)``)."""
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
        base = seed + (s * (max_bounces + 1) + b) * 16

        rr_apply = b > rr_start
        u_rr = _uniform(ray_id, base + 0)
        killed = rr_apply & (u_rr < 0.2)
        alive = alive & ~killed
        rr_fac = jnp.where(rr_apply, f32(1.25), f32(1.0))
        wr = wr * rr_fac
        wg = wg * rr_fac
        wb = wb * rr_fac

        tmax = jnp.where(alive, kfar, f32(0.0))
        t, hu, hv, fid, hitf = trace(
            px, py, pz, dx, dy, dz,
            jnp.full((_BLK_SUB, _BLK_LANE), eps_t, f32), tmax, True)

        # face table: [gn 3 | kd 3 | ke 3 | ks 3 | kt 3 | ior | dissolve
        #              | (fvn 9)]
        cols = list(range(17)) + (list(range(17, 26)) if C >= 26 else [])
        rows = face_row(fid, cols)
        (gnx, gny, gnz, kdx, kdy, kdz, kex, key_, kez, ksx, ksy, ksz,
         ktx, kty, ktz, ior, dissolve) = rows[:17]
        if C >= 26:
            n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z = rows[17:26]
            w0 = 1.0 - hu - hv
            nx = w0 * n0x + hu * n1x + hv * n2x
            ny = w0 * n0y + hu * n1y + hv * n2y
            nz = w0 * n0z + hu * n1z + hv * n2z
            nx, ny, nz, _ = _normalize3(nx, ny, nz)
        else:
            nx, ny, nz = gnx, gny, gnz

        def shadow_trace(hx, hy, hz, ldx, ldy, ldz, smax):
            _, _, _, _, sh = trace(
                hx, hy, hz, ldx, ldy, ldz,
                jnp.full((_BLK_SUB, _BLK_LANE), f32(0.00001), f32),
                smax, False)
            return sh.astype(jnp.int32)

        st2 = (px, py, pz, dx, dy, dz, cr, cg, cb, wr, wg, wb,
               alive_i, do_em_i)
        # stride-1 wedge cycle in s (coprime with ANY strata count;
        # a constant stride like 5 degenerates when it shares a factor)
        wedge = (s + b * 3) % az_strata if az_strata > 1 else None
        return _bounce_step(
            ray_id, base, st2, t, hu, hv, hitf, alive,
            nx, ny, nz, kdx, kdy, kdz, kex, key_, kez, ksx, ksy, ksz,
            ktx, kty, ktz, ior, dissolve, L, light_ref, trig,
            shadow_trace, zeros, az_wedge=wedge, az_strata=az_strata)

    def sample(s, acc):
        ar, ag, ab = acc
        st = (ox0, oy0, oz0, dx0, dy0, dz0,
              zeros, zeros, zeros,
              jnp.ones((_BLK_SUB, _BLK_LANE), f32),
              jnp.ones((_BLK_SUB, _BLK_LANE), f32),
              jnp.ones((_BLK_SUB, _BLK_LANE), f32),
              iones, iones)
        st = jax.lax.fori_loop(
            0, max_bounces, lambda b, c: bounce(b, s, c), st)
        return (ar + st[6], ag + st[7], ab + st[8])

    ar, ag, ab = jax.lax.fori_loop(0, spp, sample, (zeros, zeros, zeros))
    out_ref[0, 0] = ar
    out_ref[1, 0] = ag
    out_ref[2, 0] = ab


@functools.partial(jax.jit, static_argnames=(
    "n_lights", "rr_start", "trig", "az_strata", "interpret"))
def _render_fused_impl(tri, face, light, rays6, seed, n_lights, spp,
                       max_bounces, rr_start, trig, az_strata, interpret):
    # seed/spp/max_bounces are TRACED (they ride the kernel's SMEM meta
    # row): every (seed, spp, bounces) setting shares one compiled kernel
    F, _ = tri.shape
    C = face.shape[1]
    L = n_lights
    NB = rays6.shape[1]
    kern = functools.partial(_pt_kernel, F, C, L, rr_start, trig,
                             az_strata)
    meta = jnp.stack([jnp.asarray(seed, jnp.int32),
                      jnp.asarray(spp, jnp.int32),
                      jnp.asarray(max_bounces, jnp.int32)])
    return pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((6, 1, _BLK_SUB, _BLK_LANE),
                         lambda i: (0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3, 1, _BLK_SUB, _BLK_LANE),
                               lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (3, NB, _BLK_SUB, _BLK_LANE), jnp.float32),
        interpret=interpret,
    )(meta, tri, face, light, rays6)


# ---------------------------------------------------------------------
# BVH-traced fused kernel: same spp x bounce megakernel, but closest-hit
# and NEE shadow rays walk a VMEM-resident dense BVH16
# (traverse/fused_trace.py) instead of brute-forcing every triangle —
# the fused path at reference scene scale (nanort.h:2487-2556 semantics;
# the brute sweep stays for <= PT_FUSED_MAX_TRIS scenes where it wins).
# ---------------------------------------------------------------------

# Eligibility cap for the in-kernel-BVH16 fused route. Two constraints,
# the second one measured the hard way (r5):
# - VMEM: leaf+aux+node rows are ~0.75 MB per 1K tris at 9/leaf.
# - LAUNCH RUNTIME: the whole spp x bounce render is ONE kernel launch,
#   and the axon v5e worker kills launches that run much past ~2
#   minutes (both pt_midscale crashes died ~155 s in, process-isolated;
#   tools/logs/matrix_r5_midscale.log). Measured rates on the config-B
#   protocol (512^2 x 100 spp, mb=10): 974 faces -> 1.87 s/launch;
#   100K faces -> ~126 s/launch (31.5 s at spp=25,
#   tools/logs/exp_r5_midscale_probe.json) — per-tile shared-stack
#   unions blow up on incoherent bounce rays as the tree deepens, so
#   the fused win does NOT extrapolate with scene size. The router
#   (path_tracer._fused_bvh_spp_chunk) splits spp into equal chunks so
#   every launch stays ~<=40 s — 100K tris measured green at spp=25
#   (31.5 s/launch) — which makes launch runtime a non-binding
#   constraint up to this cap. The cap itself is the largest scale
#   MEASURED green through the chunked route; above it the auto-route
#   falls back to the per-bounce megabatch path (unknown VMEM/compile
#   behavior beyond, and the shared-stack union keeps degrading).
PT_FUSED_BVH_MAX_TRIS = 120_000
_BVH_SUB = 16  # block sublanes: the traversal granule (one shared stack)


def _pt_kernel_bvh(M, L, rr_start, trig, max_leaf, sub, az_strata,
                   spp_lanes,
                   meta_ref, mat_ref, light_ref, nodes_ref, leafs_ref,
                   aux_ref, rays_ref, out_ref, stack_ref, leafq_ref):
    from ..traverse.fused_trace import make_tracer

    f32 = jnp.float32
    kfar = f32(1.0e30)
    eps_t = f32(0.001)

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

    subi = jax.lax.broadcasted_iota(jnp.int32, (sub, _BLK_LANE), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (sub, _BLK_LANE), 1)
    ray_id = (pid * sub + subi) * _BLK_LANE + lane

    zeros = jnp.zeros((sub, _BLK_LANE), f32)
    iones = jnp.ones((sub, _BLK_LANE), jnp.int32)

    tracer = make_tracer(nodes_ref, leafs_ref, stack_ref, leafq_ref,
                         max_leaf=max_leaf, aux_ref=aux_ref,
                         intersector="mt")

    def mat_row(mid):
        """Material-table row select (M is small: a handful of rows)."""
        vals = [zeros] * 14

        def body(i, vals):
            m = mid == i
            return tuple(jnp.where(m, mat_ref[i, c], v)
                         for c, v in enumerate(vals))
        return jax.lax.fori_loop(0, M, body, tuple(vals))

    def bounce(b, s, st):
        (px, py, pz, dx, dy, dz, cr, cg, cb, wr, wg, wb,
         alive_i, do_em_i) = st
        alive = alive_i != 0
        # spp_lanes > 1 = sample-major packing: the host replicated each
        # pixel ray spp_lanes times along consecutive lanes, so the tile
        # holds fewer PIXELS and each loop iteration s advances
        # spp_lanes samples at once. The lane's true sample index seeds
        # its RNG stream (per-lane base); the azimuth wedge below stays
        # per-ITERATION so a pixel's in-flight samples share origin AND
        # bounce cone — the whole point is traversal coherence.
        if spp_lanes > 1:
            s_eff = s * spp_lanes + (ray_id % spp_lanes)
        else:
            s_eff = s
        base = seed + (s_eff * (max_bounces + 1) + b) * 16

        rr_apply = b > rr_start
        u_rr = _uniform(ray_id, base + 0)
        killed = rr_apply & (u_rr < 0.2)
        alive = alive & ~killed
        rr_fac = jnp.where(rr_apply, f32(1.25), f32(1.0))
        wr = wr * rr_fac
        wg = wg * rr_fac
        wb = wb * rr_fac

        tmax = jnp.where(alive, kfar, f32(0.0))
        t, hu, hv, _pid, hit_i, mid, gnx, gny, gnz = tracer(
            px, py, pz, dx, dy, dz,
            jnp.full((sub, _BLK_LANE), eps_t, f32), tmax,
            want_aux=True)
        hitf = hit_i != 0
        mid = jnp.maximum(mid, 0)  # miss lanes read material row 0

        (kdx, kdy, kdz, kex, key_, kez, ksx, ksy, ksz,
         ktx, kty, ktz, ior, dissolve) = mat_row(mid)

        def shadow_trace(hx, hy, hz, ldx, ldy, ldz, smax):
            return tracer(
                hx, hy, hz, ldx, ldy, ldz,
                jnp.full((sub, _BLK_LANE), f32(0.00001), f32), smax,
                occlusion=True)

        st2 = (px, py, pz, dx, dy, dz, cr, cg, cb, wr, wg, wb,
               alive_i, do_em_i)
        # stride-1 wedge cycle in s (coprime with ANY strata count;
        # a constant stride like 5 degenerates when it shares a factor)
        wedge = (s + b * 3) % az_strata if az_strata > 1 else None
        return _bounce_step(
            ray_id, base, st2, t, hu, hv, hitf, alive,
            gnx, gny, gnz, kdx, kdy, kdz, kex, key_, kez,
            ksx, ksy, ksz, ktx, kty, ktz, ior, dissolve,
            L, light_ref, trig, shadow_trace, zeros,
            az_wedge=wedge, az_strata=az_strata)

    def sample(s, acc):
        ar, ag, ab = acc
        st = (ox0, oy0, oz0, dx0, dy0, dz0,
              zeros, zeros, zeros,
              jnp.ones((sub, _BLK_LANE), f32),
              jnp.ones((sub, _BLK_LANE), f32),
              jnp.ones((sub, _BLK_LANE), f32),
              iones, iones)
        st = jax.lax.fori_loop(
            0, max_bounces, lambda b, c: bounce(b, s, c), st)
        return (ar + st[6], ag + st[7], ab + st[8])

    ar, ag, ab = jax.lax.fori_loop(0, spp // spp_lanes, sample,
                                   (zeros, zeros, zeros))
    out_ref[0, 0] = ar
    out_ref[1, 0] = ag
    out_ref[2, 0] = ab


@functools.partial(jax.jit, static_argnames=(
    "n_mats", "n_lights", "rr_start", "trig", "max_leaf", "depth", "sub",
    "az_strata", "spp_lanes", "interpret"))
def _render_fused_bvh_impl(mat, light, nodes, leafs, aux, rays6, seed,
                           n_mats, n_lights, spp, max_bounces, rr_start,
                           trig, max_leaf, depth, sub, az_strata,
                           spp_lanes, interpret):
    from ..traverse.fused_trace import fused_scratch_shapes

    NB = rays6.shape[1]
    kern = functools.partial(_pt_kernel_bvh, n_mats, n_lights, rr_start,
                             trig, max_leaf, sub, az_strata, spp_lanes)
    meta = jnp.stack([jnp.asarray(seed, jnp.int32),
                      jnp.asarray(spp, jnp.int32),
                      jnp.asarray(max_bounces, jnp.int32)])
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vmem, vmem, vmem,
            pl.BlockSpec((6, 1, sub, _BLK_LANE), lambda i: (0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3, 1, sub, _BLK_LANE),
                               lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (3, NB, sub, _BLK_LANE), jnp.float32),
        scratch_shapes=fused_scratch_shapes(depth),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta, mat, light, nodes, leafs, aux, rays6)


def build_fused_bvh_tables(scene):
    """(mat, light, nodes, leafs, aux) device arrays for the BVH kernel.

    Requires ``scene.scene8`` to be a width-16 (dense single-row) BVH16
    with the watertight leaf layout, and ``scene.fused_aux`` (the
    traverse/fused_trace.build_aux_rows table) attached by make_pt_scene.
    """
    mats = scene.materials
    mat = jnp.concatenate([
        jnp.asarray(mats.diffuse, jnp.float32),
        jnp.asarray(mats.emission, jnp.float32),
        jnp.asarray(mats.specular, jnp.float32),
        jnp.asarray(mats.transmittance, jnp.float32),
        jnp.asarray(mats.ior, jnp.float32)[:, None],
        jnp.asarray(mats.dissolve, jnp.float32)[:, None],
    ], axis=1)
    light = (scene.light_table if scene.light_table is not None
             else jnp.zeros((0, 16), jnp.float32))
    s8 = scene.scene8
    return (mat, light, jnp.asarray(s8.nodes), jnp.asarray(s8.leafs),
            jnp.asarray(scene.fused_aux))


def fused_bvh_eligible(scene) -> bool:
    """True when `scene` can ride the BVH-traced fused megakernel."""
    s8 = scene.scene8
    return (s8 is not None and getattr(s8, "width", 8) == 16
            and getattr(scene, "fused_aux", None) is not None
            and scene.facevarying_normals is None
            and scene.mesh.num_faces <= PT_FUSED_BVH_MAX_TRIS
            and (scene.light_table is not None
                 or scene.light_faces.shape[0] == 0))


def render_fused_bvh(scene, org, dirs, key, spp, max_bounces=8,
                     rr_start=3, trig="native", sub=_BVH_SUB,
                     azimuth_strata=1, spp_lanes=1, interpret=None):
    """BVH-traced fused render: radiance means (R, 3), like
    ``render_fused`` but traversing scene.scene8 in-kernel instead of
    brute-forcing the triangle list.

    ``spp_lanes`` (sample-major packing): replicate each pixel across
    that many consecutive lanes and run the in-kernel sample loop
    ``spp // spp_lanes`` times. A tile then holds fewer pixels, and a
    pixel's in-flight samples share their primary hit AND (via the
    per-iteration azimuth wedge) a diffuse bounce cone — the in-kernel
    tracer's shared-stack union shrinks the same way the AO sample-major
    recipe's does. Requires ``spp % spp_lanes == 0``; lane memory scales
    by spp_lanes. For an unbiased azimuth marginal keep
    ``(spp // spp_lanes) % azimuth_strata == 0``.

    LAUNCH-RUNTIME FOOTGUN: the whole render is one kernel launch and
    the axon worker kills launches running much past ~2 minutes (see
    PT_FUSED_BVH_MAX_TRIS). spp scales launch runtime linearly — config
    B's 100 spp runs 1.87 s on the 974-face protocol scene, so ~6000
    spp is the watchdog horizon THERE; bigger scenes hit it far sooner.
    Calling through ``render_path_traced`` is SAFE: its router splits
    spp into watchdog-sized chunks automatically
    (path_tracer._fused_bvh_spp_chunk). Direct callers of this function
    must chunk huge spp x faces themselves (multiple calls with
    fold_in keys, average).

    WARMUP FOOTGUN: ``spp`` (and every other kwarg here) is a STATIC
    kernel-grid parameter — each distinct value is its own multi-minute
    Pallas compile on the axon backend. Warm up / time at the exact spp
    you will run: an spp=1 "cheap warmup" before an spp=100 config-B
    run recompiles and once recorded 6.4 s including compile where the
    warm kernel runs 1.9 s (memory/axon-tpu-quirks, r4 matrix)."""
    if not fused_bvh_eligible(scene):
        raise ValueError(
            f"scene not eligible for the fused BVH kernel "
            f"(F={scene.mesh.num_faces}, scene8={scene.scene8 is not None})")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed = _seed_from_key(key)
    mat, light, nodes, leafs, aux = build_fused_bvh_tables(scene)
    n_mats = int(mat.shape[0])
    n_lights = int(light.shape[0])
    if n_lights == 0:
        light = jnp.zeros((1, 16), jnp.float32)
    org = jnp.asarray(org, jnp.float32).reshape(-1, 3)
    dirs = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
    R = org.shape[0]
    K = int(spp_lanes)
    if K > 1:
        if spp % K:
            raise ValueError(f"spp_lanes={K} must divide spp={spp}")
        org = jnp.repeat(org, K, axis=0)
        dirs = jnp.repeat(dirs, K, axis=0)
    RL = R * K
    blk = sub * _BLK_LANE
    NB = -(-RL // blk)
    pad = NB * blk - RL
    rays6 = jnp.concatenate([org.T, dirs.T], axis=0)  # (6, RL)
    if pad:
        rays6 = jnp.pad(rays6, ((0, 0), (0, pad)), mode="edge")
    rays6 = rays6.reshape(6, NB, sub, _BLK_LANE)
    out = _render_fused_bvh_impl(
        mat, light, nodes, leafs, aux, rays6, seed, n_mats, n_lights,
        int(spp), int(max_bounces), int(rr_start), trig,
        int(scene.scene8.max_leaf), int(scene.scene8.depth), int(sub),
        int(azimuth_strata), K, bool(interpret))
    color = out.reshape(3, NB * blk)[:, :RL]
    if K > 1:
        color = color.reshape(3, R, K).sum(axis=2)
    return color.T / jnp.float32(spp)


def fused_eligible(scene) -> bool:
    """True when `scene` (a PTScene) can ride the fused megakernel."""
    return (scene.face_table is not None
            and scene.mesh.num_faces <= PT_FUSED_MAX_TRIS
            and (scene.light_table is not None
                 or scene.light_faces.shape[0] == 0))


def build_fused_tables(scene):
    """(tri, face, light) device arrays for the kernel's SMEM refs."""
    mesh = scene.mesh
    v0 = jnp.take(mesh.vertices, mesh.faces[:, 0], axis=0)
    v1 = jnp.take(mesh.vertices, mesh.faces[:, 1], axis=0)
    v2 = jnp.take(mesh.vertices, mesh.faces[:, 2], axis=0)
    tri = jnp.concatenate([v0, v1 - v0, v2 - v0], axis=1).astype(jnp.float32)
    light = (scene.light_table if scene.light_table is not None
             else jnp.zeros((0, 16), jnp.float32))
    return tri, scene.face_table.astype(jnp.float32), light


def _seed_from_key(key) -> int:
    if isinstance(key, (int, np.integer)):
        return int(key) & 0x7FFFFFFF
    ka = key
    try:
        ka = jax.random.key_data(key)
    except Exception:
        pass
    return int(np.asarray(ka).ravel()[-1]) & 0x7FFFFFFF


def render_fused(scene, org, dirs, key, spp, max_bounces=8, rr_start=3,
                 trig="native", azimuth_strata=1, interpret=None):
    """Radiance means (R, 3) for `spp` samples per input ray.

    `key` may be a PRNGKey (folded to an int32 seed) or a plain int.
    `interpret=None` auto-selects interpret mode off-TPU so the same
    code path runs under the CPU test mesh."""
    if not fused_eligible(scene):
        raise ValueError(
            "scene not eligible for the fused kernel "
            f"(F={scene.mesh.num_faces} > {PT_FUSED_MAX_TRIS} or no "
            "face/light tables)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed = _seed_from_key(key)

    tri, face, light = build_fused_tables(scene)
    n_lights = int(light.shape[0])
    if n_lights == 0:
        light = jnp.zeros((1, 16), jnp.float32)  # keep the SMEM ref non-empty
    org = jnp.asarray(org, jnp.float32).reshape(-1, 3)
    dirs = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
    R = org.shape[0]
    NB = -(-R // _BLK)
    pad = NB * _BLK - R
    rays6 = jnp.concatenate([org.T, dirs.T], axis=0)  # (6, R)
    if pad:
        rays6 = jnp.pad(rays6, ((0, 0), (0, pad)), mode="edge")
    rays6 = rays6.reshape(6, NB, _BLK_SUB, _BLK_LANE)
    out = _render_fused_impl(tri, face, light, rays6, seed, n_lights,
                             int(spp), int(max_bounces), int(rr_start),
                             trig, int(azimuth_strata), bool(interpret))
    color = out.reshape(3, NB * _BLK)[:, :R].T
    return color / jnp.float32(spp)
