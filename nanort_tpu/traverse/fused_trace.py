"""In-kernel BVH16 traversal for fused renderer megakernels.

The fused path-tracer / AO kernels (models/pt_fused.py, models/ao_fused.py)
keep the whole render on-core; this module gives them a *trace* primitive
that walks a dense BVH16 (build/bvh8.collapse_bvh16 row layout) entirely
inside a Pallas kernel, so fused rendering scales past the brute-force
triangle cap (reference behavior: every example routes rays through
``BVHAccel::Traverse``, nanort.h:2487-2556, regardless of scene size).

Design (shared-stack packet traversal, the traverse/pallas_packet.py
two-phase shape, reduced to the VMEM-resident width-16 case):

* One SMEM scalar stack + one SMEM leaf queue per kernel block; the whole
  (S, 128) ray block shares traversal control flow with per-ray masking.
  Phase A pops nodes and pushes children/leaves with UNCONDITIONAL
  writes + masked pointer bumps (one vector->scalar sync per node pop);
  phase B drains queued leaf rows with the intersection accumulators
  carried in vector registers.
* Children visit near-first along each node's order axis using ray 0's
  direction octant as the block representative (wrong guesses cost
  order, never correctness).
* Leaf drains read triangle data as scalar lane extracts from the
  (rows, 128) leaf table; an optional parallel *aux* table carries
  per-triangle geometric normal / material id / prim id so shading needs
  no O(F) table sweep afterwards (see build_aux_rows).

Intersectors:

* ``"mt"`` — Möller–Trumbore on (p0, e1, e2), the exact op-for-op math of
  models/pt_fused._pt_kernel's brute sweep, so a BVH-traced render is
  bit-comparable to the brute-force fused render (only closest-hit ties
  at exactly equal t may resolve differently: traversal order vs prim
  order, the contract of tests/test_traverse.py).
* ``"watertight"`` — the reference's watertight test (nanort.h:993-1229)
  exactly as traverse/pallas_packet.py implements it, so fused AO's
  primary records and occlusion booleans bit-match the packet engine.

Occlusion mode encodes a found hit as t := -(tt+1) (the packet kernel's
any-hit encoding): the ray's slab interval goes empty, it stops voting in
node masks, and the block's traversal terminates early once every ray is
occluded or exhausted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu
from jax.experimental import pallas as pl

LANES = 128


def required_stack_slots(depth: int, width: int = 16) -> int:
    """SMEM stack bound for one in-flight DFS line (pop_n=1)."""
    return max(64, width * depth + 64)


def build_aux_rows(leafs: np.ndarray, material_ids, faces, vertices,
                   max_leaf: int, gn_unit=None) -> np.ndarray:
    """Per-leaf-row aux table, parallel to the watertight leaf rows.

    Layout per (1, 128) f32 row (t = slot 0..max_leaf-1):
      lanes [3t, 3t+3)   unit geometric normal of triangle t
                         (normalize(cross(e1, e2)) in f32 — the same
                         value models/path_tracer.make_pt_scene bakes
                         into face_table column 0)
      lane  32 + t       material id (exact float integer)
      lane  48 + t       prim id (exact float integer, mirrors leaf
                         lane 90+t so woop leaf tables can share it)
    """
    leafs = np.asarray(leafs)
    n_rows = leafs.shape[0]
    aux = np.zeros((n_rows, LANES), np.float32)
    mids = np.asarray(material_ids, np.int64)
    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int64)
    pid = leafs[:, 90:90 + max_leaf].astype(np.int64)
    # empty slots carry pid 0-padding in some builders; recover validity
    # from the vertex columns being all-zero is fragile — instead clamp
    # and rely on the kernel's (ti < cnt) mask like every other consumer
    pid_c = np.clip(pid, 0, f.shape[0] - 1)
    if gn_unit is not None:
        # caller-supplied unit normals (e.g. face_table column 0), so
        # the fused BVH path reads BIT-IDENTICAL normals to the brute /
        # XLA megabatch paths
        gn = np.asarray(gn_unit, np.float32)[pid_c]
    else:
        p0 = v[f[pid_c, 0]]
        p1 = v[f[pid_c, 1]]
        p2 = v[f[pid_c, 2]]
        gn = np.cross(p1 - p0, p2 - p0)
        norm = np.maximum(
            np.linalg.norm(gn, axis=-1, keepdims=True), 1e-30)
        gn = (gn / norm).astype(np.float32)
    for t in range(max_leaf):
        aux[:, 3 * t:3 * t + 3] = gn[:, t]
        aux[:, 32 + t] = mids[pid_c[:, t]].astype(np.float32)
        aux[:, 48 + t] = pid[:, t].astype(np.float32)
    return aux


def make_tracer(nodes_ref, leafs_ref, stack_ref, leafq_ref, *,
                max_leaf: int, aux_ref=None, intersector: str = "mt",
                lq_cap: int = 2, exact_edge: bool = True):
    """Build a ``trace`` closure over a dense BVH16 in VMEM.

    ``trace(ox, oy, oz, dx, dy, dz, tmin, tmax, occlusion=False,
    want_aux=False)`` traverses the block's rays ((S, 128) f32 values)
    and returns:

      occlusion:  ``occ`` int32 (1 = some hit in (tmin, tmax])
      closest:    ``(t, u, v, pid, hit)`` [+ ``(mid, gnx, gny, gnz)``
                  when want_aux] — t == tmax where missed; pid int32 -1
                  on miss; accumulators replace on tt <= t (last equal-t
                  hit in traversal order wins, ops/triangle.py:172).
    """
    f32 = jnp.float32
    inf = f32(np.inf)
    eps = f32(np.finfo(np.float32).eps)
    MM = f32(1.00000024)  # 4-ulp robust slab factor (nanort.h:2303-2305)
    BIG = f32(3.0e38)

    def trace(ox, oy, oz, dx, dy, dz, tmin, tmax, occlusion=False,
              want_aux=False, skip=None):
        shape = ox.shape
        zeros = jnp.zeros(shape, f32)
        izeros = jnp.zeros(shape, jnp.int32)

        # ---- sanitize degenerate rays into guaranteed misses (the
        # packet kernel's contract, pallas_packet.py:121-145): zero
        # dirs / huge components otherwise fault or NaN-poison ----
        okr = ((jnp.abs(ox) < BIG) & (jnp.abs(oy) < BIG)
               & (jnp.abs(oz) < BIG) & (jnp.abs(dx) < BIG)
               & (jnp.abs(dy) < BIG) & (jnp.abs(dz) < BIG)
               & (jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz) > 0))
        sox = jnp.where(okr, ox, 0.0)
        soy = jnp.where(okr, oy, 0.0)
        soz = jnp.where(okr, oz, 0.0)
        sdx = jnp.where(okr, dx, 1.0)
        sdy = jnp.where(okr, dy, 0.0)
        sdz = jnp.where(okr, dz, 0.0)
        s_min = jnp.where(okr, tmin, inf)
        s_max = jnp.where(okr, tmax, inf)

        def safe_inv(d):
            tiny = jnp.abs(d) < eps
            neg = jax.lax.bitcast_convert_type(d, jnp.int32) < 0
            return jnp.where(tiny, jnp.where(neg, -inf, inf),
                             1.0 / jnp.where(tiny, 1.0, d))

        ix, iy, iz = safe_inv(sdx), safe_inv(sdy), safe_inv(sdz)
        snx, sny, snz = sdx < 0, sdy < 0, sdz < 0

        # representative octant for near-first child pop order
        neg_ax = (sdx[0, 0] < 0, sdy[0, 0] < 0, sdz[0, 0] < 0)

        if intersector == "watertight":
            # per-trace shear coefficients (nanort.h:1163-1201), exactly
            # as pallas_packet._kernel_body computes them
            def comp(vx, vy, vz, k):
                return jnp.where(k == 0, vx, jnp.where(k == 1, vy, vz))

            C47 = f32(4097.0)

            def two_prod(a, b):
                p = a * b
                a1 = a * C47
                ah = a1 - (a1 - a)
                al = a - ah
                b1 = b * C47
                bh = b1 - (b1 - b)
                bl = b - bh
                err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
                return p, err

            def prod_diff(a, b, c, d):
                p1, e1 = two_prod(a, b)
                p2, e2 = two_prod(c, d)
                return (p1 - p2) + (e1 - e2)

            adx, ady, adz = jnp.abs(sdx), jnp.abs(sdy), jnp.abs(sdz)
            kz = jnp.where(ady > adx, 1, 0)
            amax = jnp.where(ady > adx, ady, adx)
            kz = jnp.where(adz > amax, 2, kz).astype(jnp.int32)
            kx = (kz + 1) % 3
            ky = (kx + 1) % 3
            dkz = comp(sdx, sdy, sdz, kz)
            negkz = dkz < 0
            kx, ky = (jnp.where(negkz, ky, kx),
                      jnp.where(negkz, kx, ky))
            shx = comp(sdx, sdy, sdz, kx) / dkz
            shy = comp(sdx, sdy, sdz, ky) / dkz
            shz = 1.0 / dkz

        stack_ref[0] = 0

        # ---- phase A: pop one node, slab-test 16 children, push ----
        def node_step(c):
            sp, lq, t_b = c
            sp = sp - 1
            idx = stack_ref[sp]
            row = nodes_ref[pl.ds(idx, 1), :]
            m = None
            for w in range(16):
                b0x, b0y, b0z = (row[0, 6 * w], row[0, 6 * w + 1],
                                 row[0, 6 * w + 2])
                b1x, b1y, b1z = (row[0, 6 * w + 3], row[0, 6 * w + 4],
                                 row[0, 6 * w + 5])
                lox = jnp.where(snx, b1x, b0x)
                hix = jnp.where(snx, b0x, b1x)
                loy = jnp.where(sny, b1y, b0y)
                hiy = jnp.where(sny, b0y, b1y)
                loz = jnp.where(snz, b1z, b0z)
                hiz = jnp.where(snz, b0z, b1z)
                t0 = jnp.maximum(
                    jnp.maximum((lox - sox) * ix, (loy - soy) * iy),
                    jnp.maximum((loz - soz) * iz, s_min))
                t1 = jnp.minimum(
                    jnp.minimum((hix - sox) * ix * MM,
                                (hiy - soy) * iy * MM),
                    jnp.minimum((hiz - soz) * iz * MM, t_b))
                hit_c = (t0 <= t1).astype(jnp.int32) << w
                m = hit_c if m is None else m | hit_c
            for sh in (64, 32, 16, 8, 4, 2, 1):
                m = m | pltpu.roll(m, sh, axis=1)
            sh = 1
            while sh < m.shape[0]:
                m = m | pltpu.roll(m, sh, axis=0)
                sh *= 2
            mask = m[0, 0]

            v112 = row[0, 112]
            neg = jnp.where(v112 >= 32.0, neg_ax[2],
                            jnp.where(v112 >= 16.0, neg_ax[1],
                                      neg_ax[0]))
            for j in range(16):
                jd = 15 - j
                cc = jnp.where(neg, j, jd)
                bit = (mask >> cc) & 1
                meta = jnp.where(neg, row[0, 96 + j],
                                 row[0, 96 + jd]).astype(jnp.int32)
                cnt = jnp.where(neg, row[0, 112 + j],
                                row[0, 112 + jd]).astype(jnp.int32)
                internal = (meta >= 0).astype(jnp.int32)
                stack_ref[sp] = meta
                sp = sp + bit * internal
                leafq_ref[lq] = ((-meta - 1) << 4) | (cnt & 15)
                lq = lq + bit * (1 - internal)
            return sp, lq, t_b

        # ---- phase B: leaf drains ----
        if intersector == "mt":
            def leaf_fn(lrow, arow, cnt, carry, occ):
                if occ:
                    (t_b,) = carry
                else:
                    if want_aux:
                        (t_b, u_b, v_b, p_b, m_b,
                         gx_b, gy_b, gz_b) = carry
                    else:
                        t_b, u_b, v_b, p_b = carry
                for ti in range(max_leaf):
                    p0x, p0y, p0z = (lrow[0, 9 * ti], lrow[0, 9 * ti + 1],
                                     lrow[0, 9 * ti + 2])
                    e1x = lrow[0, 9 * ti + 3] - p0x
                    e1y = lrow[0, 9 * ti + 4] - p0y
                    e1z = lrow[0, 9 * ti + 5] - p0z
                    e2x = lrow[0, 9 * ti + 6] - p0x
                    e2y = lrow[0, 9 * ti + 7] - p0y
                    e2z = lrow[0, 9 * ti + 8] - p0z
                    # Möller–Trumbore, op-for-op the brute fused sweep
                    # (models/pt_fused._pt_kernel.trace)
                    pvx = sdy * e2z - sdz * e2y
                    pvy = sdz * e2x - sdx * e2z
                    pvz = sdx * e2y - sdy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    invd = 1.0 / jnp.where(det == 0.0, f32(1.0), det)
                    tx = sox - p0x
                    ty = soy - p0y
                    tz = soz - p0z
                    uu = (tx * pvx + ty * pvy + tz * pvz) * invd
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    vv = (sdx * qx + sdy * qy + sdz * qz) * invd
                    tt = (e2x * qx + e2y * qy + e2z * qz) * invd
                    ok = ((det != 0.0) & (uu >= 0.0) & (vv >= 0.0)
                          & (uu + vv <= 1.0) & (tt >= s_min)
                          & (tt <= t_b) & (ti < cnt))
                    if skip is not None:
                        ok = ok & (
                            lrow[0, 90 + ti].astype(jnp.int32) != skip)
                    if occ:
                        # t_b = -(tt+1) once occluded: every later
                        # tt <= t_b fails, the ray stops voting
                        t_b = jnp.where(ok, -tt - 1.0, t_b)
                    else:
                        t_b = jnp.where(ok, tt, t_b)
                        u_b = jnp.where(ok, uu, u_b)
                        v_b = jnp.where(ok, vv, v_b)
                        p_b = jnp.where(
                            ok, lrow[0, 90 + ti].astype(jnp.int32), p_b)
                        if want_aux:
                            m_b = jnp.where(
                                ok, arow[0, 32 + ti].astype(jnp.int32),
                                m_b)
                            gx_b = jnp.where(ok, arow[0, 3 * ti], gx_b)
                            gy_b = jnp.where(ok, arow[0, 3 * ti + 1],
                                             gy_b)
                            gz_b = jnp.where(ok, arow[0, 3 * ti + 2],
                                             gz_b)
                if occ:
                    return (t_b,)
                if want_aux:
                    return (t_b, u_b, v_b, p_b, m_b, gx_b, gy_b, gz_b)
                return (t_b, u_b, v_b, p_b)
        else:  # watertight (pallas_packet leaf_test, unspecialized)
            def leaf_fn(lrow, arow, cnt, carry, occ):
                if occ:
                    (t_b,) = carry
                else:
                    if want_aux:
                        (t_b, u_b, v_b, p_b, m_b,
                         gx_b, gy_b, gz_b) = carry
                    else:
                        t_b, u_b, v_b, p_b = carry
                for ti in range(max_leaf):
                    a3 = (lrow[0, 9 * ti] - sox,
                          lrow[0, 9 * ti + 1] - soy,
                          lrow[0, 9 * ti + 2] - soz)
                    b3 = (lrow[0, 9 * ti + 3] - sox,
                          lrow[0, 9 * ti + 4] - soy,
                          lrow[0, 9 * ti + 5] - soz)
                    c3 = (lrow[0, 9 * ti + 6] - sox,
                          lrow[0, 9 * ti + 7] - soy,
                          lrow[0, 9 * ti + 8] - soz)
                    Az = comp(*a3, kz)
                    Bz = comp(*b3, kz)
                    Cz = comp(*c3, kz)
                    Ax = comp(*a3, kx) - shx * Az
                    Ay = comp(*a3, ky) - shy * Az
                    Bx = comp(*b3, kx) - shx * Bz
                    By = comp(*b3, ky) - shy * Bz
                    Cx = comp(*c3, kx) - shx * Cz
                    Cy = comp(*c3, ky) - shy * Cz
                    U = Cx * By - Cy * Bx
                    V = Ax * Cy - Ay * Cx
                    W = Bx * Ay - By * Ax
                    if exact_edge:
                        # Dekker double-word recompute on zero edge
                        # functions (nanort.h:1093-1107; the packet
                        # kernel's single-pass exact mode)
                        zm = (U == 0.0) | (V == 0.0) | (W == 0.0)
                        U = jnp.where(zm, prod_diff(Cx, By, Cy, Bx), U)
                        V = jnp.where(zm, prod_diff(Ax, Cy, Ay, Cx), V)
                        W = jnp.where(zm, prod_diff(Bx, Ay, By, Ax), W)
                    edge_ok = (
                        (jnp.minimum(jnp.minimum(U, V), W) >= 0.0)
                        | (jnp.maximum(jnp.maximum(U, V), W) <= 0.0))
                    det = U + V + W
                    # det == 0 with agreeing signs forces U=V=W=0 ->
                    # tt = 0*inf = NaN fails the range tests (the packet
                    # kernel's argument, pallas_packet.py:373-379)
                    rcp = 1.0 / det
                    tt = (U * (shz * Az) + V * (shz * Bz)
                          + W * (shz * Cz)) * rcp
                    ok = (edge_ok & (tt >= s_min) & (tt <= t_b)
                          & (ti < cnt))
                    if skip is not None:
                        ok = ok & (
                            lrow[0, 90 + ti].astype(jnp.int32) != skip)
                    if occ:
                        t_b = jnp.where(ok, -tt - 1.0, t_b)
                    else:
                        t_b = jnp.where(ok, tt, t_b)
                        u_b = jnp.where(ok, V * rcp, u_b)
                        v_b = jnp.where(ok, W * rcp, v_b)
                        p_b = jnp.where(
                            ok, lrow[0, 90 + ti].astype(jnp.int32), p_b)
                        if want_aux:
                            m_b = jnp.where(
                                ok, arow[0, 32 + ti].astype(jnp.int32),
                                m_b)
                            gx_b = jnp.where(ok, arow[0, 3 * ti], gx_b)
                            gy_b = jnp.where(ok, arow[0, 3 * ti + 1],
                                             gy_b)
                            gz_b = jnp.where(ok, arow[0, 3 * ti + 2],
                                             gz_b)
                if occ:
                    return (t_b,)
                if want_aux:
                    return (t_b, u_b, v_b, p_b, m_b, gx_b, gy_b, gz_b)
                return (t_b, u_b, v_b, p_b)

        def run(occ: bool, init: tuple):
            def drain_body(q, carry):
                packed = leafq_ref[q]
                lrow = leafs_ref[pl.ds(packed >> 4, 1), :]
                if aux_ref is not None:
                    arow = aux_ref[pl.ds(packed >> 4, 1), :]
                else:
                    arow = lrow
                return leaf_fn(lrow, arow, packed & 15, carry, occ)

            def outer(state):
                sp = state[0]
                acc = state[1:]
                sp, lq, _ = jax.lax.while_loop(
                    lambda c: (c[0] > 0) & (c[1] < lq_cap),
                    node_step,
                    (sp, jnp.int32(0), acc[0]),
                )
                acc = jax.lax.fori_loop(0, lq, drain_body, acc)
                return (sp,) + tuple(acc)

            fin = jax.lax.while_loop(
                lambda st: st[0] > 0, outer, (jnp.int32(1),) + init)
            return fin[1:]

        if occlusion:
            (t_b,) = run(True, (s_max,))
            return (t_b < 0.0).astype(jnp.int32)

        if want_aux:
            init = (s_max, zeros, zeros, izeros - 1, izeros,
                    zeros, zeros, zeros)
            t_b, u_b, v_b, p_b, m_b, gx, gy, gz = run(False, init)
        else:
            init = (s_max, zeros, zeros, izeros - 1)
            t_b, u_b, v_b, p_b = run(False, init)
        hit = (t_b < s_max) & okr & (s_max > s_min)
        # misses report the caller's tmax (the brute sweep's convention)
        t_o = jnp.where(hit, t_b, tmax)
        if want_aux:
            return t_o, u_b, v_b, p_b, hit.astype(jnp.int32), m_b, gx, gy, gz
        return t_o, u_b, v_b, p_b, hit.astype(jnp.int32)

    return trace


def fused_scratch_shapes(depth: int, width: int = 16):
    """(stack, leafq) SMEM scratch shapes for pl.pallas_call."""
    return [
        pltpu.SMEM((required_stack_slots(depth, width),), jnp.int32),
        pltpu.SMEM((64,), jnp.int32),
    ]
