"""Pallas BVH8 packet traversal — the speed-of-light TPU kernel.

Design (see build/bvh8.py for the data layout):

* The whole scene lives in VMEM: BVH8 node rows (~0.5 KB/node) plus the
  packed leaf-triangle rows. A 1M-triangle scene is ~55 MB, well inside
  the v5e's physical VMEM with ``vmem_limit_bytes`` raised (the 16 MB
  figure is only the default scoped limit).
* Rays are processed in coherent packets of (SUB, 128) (default 1024
  rays) — one packet per grid step. Traversal state that varies per ray
  (t/u/v/prim id) are VMEM tiles; the traversal stack is a single SMEM
  scalar stack *per packet*, not per ray — packets share one DFS control
  flow, with per-ray masking in the AABB/triangle tests. This removes
  the per-ray stack scatters entirely and reduces control flow to one
  scalar while-loop, the shape TPUs execute well.
* One BVH8 step = one sublane-dynamic row fetch + 8 slab tests over the
  whole packet on the VPU (measured ~200 ns/step for 1024 rays) + masked
  child pushes. Leaves run as a ``pl.when``-guarded block testing up to
  10 triangles against the packet with the watertight intersector —
  skipped entirely when no ray hits the leaf's box.

Semantics match the reference kernel (nanort.h:2487-2556 + 993-1229):
robust 4-ulp slab test, watertight Moller-Trumbore with optional
double-word exact edge fallback, tt<=t replace ordering (ties resolve by
traversal order, which is packet-granular near-first order here rather
than the reference's per-ray order — legal per the equal-t contract).
Children are visited near-first along each node's order axis (the build
sorts them; the kernel picks pop order from the packet's direction sign),
and each hit leaf drains immediately so the packet's t bound tightens
before the next node pop — together worth ~1.5x over unordered traversal
with deferred leaf batching.
"""

from __future__ import annotations

import functools
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..build.bvh8 import BVH8Scene
from ..core.options import BVHTraceOptions, INVALID_PRIM_ID
from ..core.ray import Hits, Rays

LANES = 128
# pltpu.roll shift that makes lane L read lane L+k (frustum16 axis
# folds); roll(x, s)[l] = x[(l - s) % 128], so L+k needs s = 128 - k
# (verified on v5e, tools/exp_r4_rollprobe.py)
ROLL_M1 = 127
ROLL_M2 = 126
ROLL_M3 = 125
DEF_SUB = 32  # sublanes per packet -> 32*128 = 4096 rays (best measured
# for both coherent megabatches and sorted secondary bounces: big packets
# amortize the ~800ns per-node scalar sync now that ordered traversal
# keeps the union footprint small)





def _kernel_body(
    nodes_ref,
    leafs_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    mint_ref, maxt_ref,
    skip_ref,
    pkt_ref,
    *out_refs,
    cull_back_face: bool,
    exact_edge_fallback: bool,
    use_skip: bool,
    stack_size: int,
    leaf_unroll: int,
    pop_n: int,
    occlusion: bool,
    prim_range: tuple | None = None,
    inkernel_exact: bool = False,
    hbm_nodes: bool = False,
    hbm_leafs: bool = False,
    use_roots: bool = False,
    frustum: bool = False,
    t_sync_every: int = 2,
    lq_cap: int = 1,
    intersector: str = "watertight",
    debug_counts: bool = False,
    flag_zero_edges: bool = False,
    kz_static: int | None = None,
    shared_origin: bool = False,
    uniform_sign: bool = False,
    width: int = 8,
    fr_pop_n: int = 2,
    refit: bool = False,
    refit_exact: bool = False,
    oracle_t: bool = False,
    nodes_hi_ref=None,
    leafs_hi_ref=None,
    rleafs_ref=None,
    n_node_lo: int = 0,
    n_leaf_lo: int = 0,
):
    out_refs = list(out_refs)
    if flag_zero_edges:
        t_out, u_out, v_out, pid_out, z_out = out_refs[:5]
        del out_refs[:5]
    else:
        t_out, u_out, v_out, pid_out = out_refs[:4]
        del out_refs[:4]
    stack_ref, leafq_ref = out_refs[:2]
    del out_refs[:2]
    # HBM-resident tables stream through VMEM scratch rows via async DMA
    # (scenes past the ~116 MB VMEM scoped limit: the reference's
    # "~10M triangles efficiently" claim, README.md:19)
    if hbm_nodes:
        node_buf, node_sem = out_refs[:2]
        del out_refs[:2]
    if hbm_leafs:
        leaf_bufs, leaf_sems = out_refs[:2]
        del out_refs[:2]
    if refit:
        # drained-row replay queue (SMEM) + raw-leaf stream buffers:
        # rq_ref[0] = count, entries (packed row<<4|cnt) from slot 1
        rq_ref, rbuf, rsems = out_refs[:3]
        del out_refs[:3]
        rq_ref[0] = 0
    f32 = jnp.float32
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    min_t = mint_ref[:]
    max_t = maxt_ref[:]
    skip_pid = skip_ref[:] if use_skip else None

    # sanitize degenerate rays IN-KERNEL (free: once per packet): they
    # must MISS — NaN comparisons are all-false and a zero direction
    # makes every triangle det==0 in the reference (nanort.h:2303-2348,
    # 1202-1229) — but raw NaN origins, and zero dirs combined with huge
    # (~1e30) origins as BDPT's escaped-ray slots produce, fault this
    # Mosaic build (TPU worker crash). Replace with inert dummies whose
    # min_t = max_t = +inf: every slab interval is empty (the NaN-robust
    # where-folds keep tmin at +inf) and every triangle fails tt >= min_t,
    # so they traverse nothing and report t = +inf — which no caller
    # max_t reads back as a hit. The ok mask dies at setup; keeping it
    # live to fix t at the end instead costs ~8% (pinned VREGs).
    BIG = f32(3.0e38)
    okr = (
        (jnp.abs(ox) < BIG) & (jnp.abs(oy) < BIG) & (jnp.abs(oz) < BIG)
        & (jnp.abs(dx) < BIG) & (jnp.abs(dy) < BIG) & (jnp.abs(dz) < BIG)
        & (jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz) > 0)
    )
    ox = jnp.where(okr, ox, 0.0)
    oy = jnp.where(okr, oy, 0.0)
    oz = jnp.where(okr, oz, 0.0)
    dx = jnp.where(okr, dx, 1.0)
    dy = jnp.where(okr, dy, 0.0)
    dz = jnp.where(okr, dz, 0.0)
    min_t = jnp.where(okr, min_t, jnp.float32(np.inf))
    max_t = jnp.where(okr, max_t, jnp.float32(np.inf))
    if oracle_t:
        # decomposition instrument (tools/exp_r5_decomp.py): start every
        # ray's t bound at a PRECOMPUTED final t (bitcast through the
        # skip tile, which is mutually exclusive with skip filtering).
        # The traversal then runs with converged-bound visit counts;
        # together with debug_counts this separates node-phase from
        # leaf-phase cost in the shipped kernel. Not a user mode.
        max_t = jnp.minimum(
            max_t, jax.lax.bitcast_convert_type(skip_ref[:], jnp.float32)
        )

    eps = f32(np.finfo(np.float32).eps)
    inf = f32(np.inf)

    def safe_inv2(d):
        # copysign(inf, d) semantics incl. -0.0 via the sign bit
        tiny = jnp.abs(d) < eps
        neg = jax.lax.bitcast_convert_type(d, jnp.int32) < 0  # sign bit incl -0.0
        return jnp.where(tiny, jnp.where(neg, -inf, inf), 1.0 / jnp.where(tiny, 1.0, d))

    ix, iy, iz = safe_inv2(dx), safe_inv2(dy), safe_inv2(dz)
    nx, ny, nz = dx < 0, dy < 0, dz < 0
    if uniform_sign:
        # every LIVE ray of each packet shares its direction octant
        # (detect_specialization verified it; per-packet sign flags ride
        # pkt_ref lanes 23-25): the slab bound selection becomes SCALAR
        # selects between the two scalar bounds — 6 fewer vector selects
        # per child test. Dead / sanitized rays may disagree with the
        # packet sign, but their slab interval is empty by construction
        # (min_t=+inf or max_t<min_t), so their vote is false either way.
        snx = pkt_ref[0, 23] > 0.5
        sny = pkt_ref[0, 24] > 0.5
        snz = pkt_ref[0, 25] > 0.5
    else:
        snx, sny, snz = nx, ny, nz

    def comp(vx, vy, vz, k):
        return jnp.where(k == 0, vx, jnp.where(k == 1, vy, vz))

    if kz_static is None:
        # watertight shear coefficients (nanort.h:1163-1201), vectorized
        adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
        # strict-< chain, first max wins (nanort.h:1166-1176)
        kz = jnp.where(ady > adx, 1, 0)
        amax = jnp.where(ady > adx, ady, adx)
        kz = jnp.where(adz > amax, 2, kz).astype(jnp.int32)
        kx = (kz + 1) % 3
        ky = (kx + 1) % 3
        dkz = comp(dx, dy, dz, kz)
        negkz = dkz < 0
        kx, ky = jnp.where(negkz, ky, kx), jnp.where(negkz, kx, ky)
        sx = comp(dx, dy, dz, kx) / dkz
        sy = comp(dx, dy, dz, ky) / dkz
        sz = 1.0 / dkz
    else:
        # static shear axis: every live ray in the batch shares the same
        # kz = argmax |d| (detect_specialization checked it), so the
        # per-ray comp() selects collapse to static lane reads. The
        # reference's winding swap (kx <-> ky when d[kz] < 0,
        # nanort.h:1180-1184) is skipped: with cull_back_face off it only
        # negates U, V, W and det globally per ray, which cancels exactly
        # in every emitted record (IEEE negation commutes with rounding),
        # so hit/prim/t are bit-identical to the swapped computation.
        # Sole exception: an exact-edge hit has V or W == +0.0 in both
        # variants (fl(a-b) of equal values is +0), so u = V*rcp flips
        # the SIGN OF ZERO (+0 vs -0, == -equal) on such rays — measured
        # 102/65536 zero-sign u diffs on an axis-aligned scene, zero
        # diffs elsewhere.
        KZ = kz_static
        KX = (KZ + 1) % 3
        KY = (KZ + 2) % 3
        d3 = (dx, dy, dz)
        dkz = d3[KZ]
        sx = d3[KX] / dkz
        sy = d3[KY] / dkz
        sz = 1.0 / dkz

    if shared_origin:
        # every ray in the batch shares ONE origin (camera primaries):
        # vertex-minus-origin terms become scalar-unit arithmetic on the
        # same f32 values, bit-identical to the per-ray vector form.
        # Degenerate rays were sanitized to min_t = +inf above and can
        # never validate a hit regardless of the origin used.
        osx = pkt_ref[0, 20]
        osy = pkt_ref[0, 21]
        osz = pkt_ref[0, 22]
        os3 = (osx, osy, osz)

    # per-packet start node (treelet binning roots the packet at its
    # bin's subtree; see traverse/treelet.py) — 0 (the global root) by
    # default. Per-packet scalars ride in one 128-lane SMEM row (lane 16,
    # stored as an exact float integer): TPU BlockSpecs require the last
    # dim 128-divisible even for SMEM blocks.
    root0 = pkt_ref[0, 16].astype(jnp.int32) if use_roots else 0
    stack_ref[0] = root0

    # packet-representative direction signs for near-first child ordering
    # (rays arrive coherence-sorted, so ray 0's octant stands for the
    # packet; a wrong guess only costs order, never correctness)
    neg_ax = (dx_ref[0, 0] < 0, dy_ref[0, 0] < 0, dz_ref[0, 0] < 0)

    C = f32(4097.0)

    def two_prod(a, b):
        p = a * b
        a1 = a * C
        ah = a1 - (a1 - a)
        al = a - ah
        b1 = b * C
        bh = b1 - (b1 - b)
        bl = b - bh
        err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        return p, err

    def prod_diff(a, b, c, d):
        p1, e1 = two_prod(a, b)
        p2, e2 = two_prod(c, d)
        return (p1 - p2) + (e1 - e2)

    def make_leaf_test(exact: bool, collect: bool):
        if intersector == "woop":
            # turbo intersector: per-tri baked unit-triangle transforms
            # (build/bvh8.build_woop_leafs) — ~40% fewer leaf ops than
            # the watertight test; not bit-parity with the reference
            def leaf_test_woop(lrow, cnt, carry):
                t_b, u_b, v_b, p_b = carry
                rox, roy, roz = os3 if shared_origin else (ox, oy, oz)
                for ti in range(leaf_unroll):
                    ba = 12 * ti
                    # translate-then-rotate: o' = M (o - p0) keeps the
                    # origin-relative terms well-conditioned (the fused
                    # b = -M p0 form cancels catastrophically when the
                    # scene sits far from the world origin)
                    rx = rox - lrow[0, ba + 9]
                    ry = roy - lrow[0, ba + 10]
                    rz = roz - lrow[0, ba + 11]
                    m20, m21, m22 = (lrow[0, ba + 6], lrow[0, ba + 7],
                                     lrow[0, ba + 8])
                    opz = m20 * rx + m21 * ry + m22 * rz
                    dpz = m20 * dx + m21 * dy + m22 * dz
                    rcp = 1.0 / dpz  # +-inf on plane-parallel; NaN folds
                    tt = -opz * rcp  # to invalid below
                    m00, m01, m02 = (lrow[0, ba], lrow[0, ba + 1],
                                     lrow[0, ba + 2])
                    uu = (m00 * rx + m01 * ry + m02 * rz
                          ) + tt * (m00 * dx + m01 * dy + m02 * dz)
                    m10, m11, m12 = (lrow[0, ba + 3], lrow[0, ba + 4],
                                     lrow[0, ba + 5])
                    vv = (m10 * rx + m11 * ry + m12 * rz
                          ) + tt * (m10 * dx + m11 * dy + m12 * dz)
                    pid_t = lrow[0, 108 + ti].astype(jnp.int32)
                    valid = (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                    valid = valid & (tt <= t_b) & (tt >= min_t) & (ti < cnt)
                    if cull_back_face:
                        valid = valid & (dpz < 0.0)
                    if use_skip:
                        valid = valid & (pid_t != skip_pid)
                    if prim_range is not None:
                        valid = valid & (pid_t >= prim_range[0]) & (
                            pid_t < prim_range[1]
                        )
                    t_b = jnp.where(valid, tt, t_b)
                    u_b = jnp.where(valid, uu, u_b)
                    v_b = jnp.where(valid, vv, v_b)
                    p_b = jnp.where(valid, pid_t, p_b)
                    if occlusion:
                        t_b = jnp.where(valid, -tt - 1.0, t_b)
                return t_b, u_b, v_b, p_b

            return leaf_test_woop

        def leaf_test(lrow, cnt, carry):
            # accumulators live in vector registers across the whole drain
            # loop (VMEM read/write round trips per leaf measurably stall)
            if collect:
                t_b, u_b, v_b, p_b, z_b = carry
            else:
                t_b, u_b, v_b, p_b = carry
            ro3 = os3 if shared_origin else (ox, oy, oz)
            for ti in range(leaf_unroll):
                p0x, p0y, p0z = lrow[0, 9 * ti], lrow[0, 9 * ti + 1], lrow[0, 9 * ti + 2]
                p1x, p1y, p1z = lrow[0, 9 * ti + 3], lrow[0, 9 * ti + 4], lrow[0, 9 * ti + 5]
                p2x, p2y, p2z = lrow[0, 9 * ti + 6], lrow[0, 9 * ti + 7], lrow[0, 9 * ti + 8]
                pid_t = lrow[0, 90 + ti].astype(jnp.int32)

                a3 = (p0x - ro3[0], p0y - ro3[1], p0z - ro3[2])
                b3 = (p1x - ro3[0], p1y - ro3[1], p1z - ro3[2])
                c3 = (p2x - ro3[0], p2y - ro3[1], p2z - ro3[2])
                if kz_static is None:
                    Az = comp(*a3, kz)
                    Bz = comp(*b3, kz)
                    Cz = comp(*c3, kz)
                    Ax = comp(*a3, kx) - sx * Az
                    Ay = comp(*a3, ky) - sy * Az
                    Bx = comp(*b3, kx) - sx * Bz
                    By = comp(*b3, ky) - sy * Bz
                    Cx = comp(*c3, kx) - sx * Cz
                    Cy = comp(*c3, ky) - sy * Cz
                else:
                    # static shear axis: lane reads, no vector selects
                    # (with shared_origin the a/b/c components are scalar
                    # too, so only the sx/sy products touch the VPU)
                    Az, Bz, Cz = a3[KZ], b3[KZ], c3[KZ]
                    Ax = a3[KX] - sx * Az
                    Ay = a3[KY] - sy * Az
                    Bx = b3[KX] - sx * Bz
                    By = b3[KY] - sy * Bz
                    Cx = c3[KX] - sx * Cz
                    Cy = c3[KY] - sy * Cz

                U = Cx * By - Cy * Bx
                V = Ax * Cy - Ay * Cx
                W = Bx * Ay - By * Ax
                if collect:
                    # rays whose result COULD differ under the exact edge
                    # recompute: any in-range tri with a zero edge function
                    z_b = z_b | (
                        ((U == 0.0) | (V == 0.0) | (W == 0.0)) & (ti < cnt)
                    ).astype(jnp.int32)
                if exact:
                    zmask = (U == 0.0) | (V == 0.0) | (W == 0.0)
                    U = jnp.where(zmask, prod_diff(Cx, By, Cy, Bx), U)
                    V = jnp.where(zmask, prod_diff(Ax, Cy, Ay, Cx), V)
                    W = jnp.where(zmask, prod_diff(Bx, Ay, By, Ax), W)
                # sign agreement via a min/max fold: boolean-equivalent to
                # the reference's (U<0|V<0|W<0)&(U>0|V>0|W>0) reject
                # (nanort.h:1270-1281) at 7 VPU ops instead of 12. A NaN
                # edge term makes edge_ok false here where the sign form
                # left it true, but such a lane can never validate either
                # way (NaN det -> NaN tt fails the range tests), so every
                # emitted record is bit-identical.
                if cull_back_face:
                    edge_ok = jnp.minimum(jnp.minimum(U, V), W) >= 0.0
                else:
                    edge_ok = (jnp.minimum(jnp.minimum(U, V), W) >= 0.0) | (
                        jnp.maximum(jnp.maximum(U, V), W) <= 0.0
                    )
                det = U + V + W
                # det == 0 needs no explicit guard: with agreeing signs it
                # forces U = V = W = 0, so the t numerator is exactly 0 and
                # tt = 0 * inf = NaN, which fails tt <= t_b; with mixed
                # signs edge_ok already rejected the lane. rcp is
                # bit-identical to the guarded 1/det whenever det != 0.
                rcp = 1.0 / det
                tt = (U * (sz * Az) + V * (sz * Bz) + W * (sz * Cz)) * rcp
                valid = edge_ok & (tt <= t_b) & (tt >= min_t)
                valid = valid & (ti < cnt)
                if use_skip:
                    valid = valid & (pid_t != skip_pid)
                if prim_range is not None:
                    # reference prim-ID window filter (nanort.h:1054-1063):
                    # two VPU compares against baked constants, near-free
                    valid = valid & (pid_t >= prim_range[0]) & (
                        pid_t < prim_range[1]
                    )
                t_b = jnp.where(valid, tt, t_b)
                u_b = jnp.where(valid, V * rcp, u_b)
                v_b = jnp.where(valid, W * rcp, v_b)
                p_b = jnp.where(valid, pid_t, p_b)
                if occlusion:
                    # any-hit: encode the found distance as -(tt+1) — still
                    # below every slab interval (shadow rays have min_t >= 0),
                    # so the ray stops voting in node masks and the packet
                    # terminates once every ray is occluded or exhausted,
                    # while the actual hit distance stays recoverable
                    t_b = jnp.where(valid, -tt - 1.0, t_b)
            if collect:
                return t_b, u_b, v_b, p_b, z_b
            return t_b, u_b, v_b, p_b

        return leaf_test

    def refit_row(lrow, cnt, carry):
        """Watertight re-evaluation of one RAW leaf row against the
        packet, overwriting (t, u, v) for rays whose woop-selected
        winner (matched by prim id) lives in this row — the in-kernel
        counterpart of refit_hits_watertight (VERDICT r3 #1). The
        per-tri shear math mirrors make_leaf_test's watertight path
        (keep in sync); only the accept condition differs: prim-id
        match + a successful watertight test (reject keeps the woop
        record, same contract as the host refit)."""
        t_b, u_b, v_b, p_b = carry
        ro3 = os3 if shared_origin else (ox, oy, oz)
        for ti in range(leaf_unroll):
            p0 = (lrow[0, 9 * ti], lrow[0, 9 * ti + 1], lrow[0, 9 * ti + 2])
            p1 = (lrow[0, 9 * ti + 3], lrow[0, 9 * ti + 4], lrow[0, 9 * ti + 5])
            p2 = (lrow[0, 9 * ti + 6], lrow[0, 9 * ti + 7], lrow[0, 9 * ti + 8])
            pid_t = lrow[0, 90 + ti].astype(jnp.int32)
            a3 = (p0[0] - ro3[0], p0[1] - ro3[1], p0[2] - ro3[2])
            b3 = (p1[0] - ro3[0], p1[1] - ro3[1], p1[2] - ro3[2])
            c3 = (p2[0] - ro3[0], p2[1] - ro3[1], p2[2] - ro3[2])
            if kz_static is None:
                Az = comp(*a3, kz)
                Bz = comp(*b3, kz)
                Cz = comp(*c3, kz)
                Ax = comp(*a3, kx) - sx * Az
                Ay = comp(*a3, ky) - sy * Az
                Bx = comp(*b3, kx) - sx * Bz
                By = comp(*b3, ky) - sy * Bz
                Cx = comp(*c3, kx) - sx * Cz
                Cy = comp(*c3, ky) - sy * Cz
            else:
                Az, Bz, Cz = a3[KZ], b3[KZ], c3[KZ]
                Ax = a3[KX] - sx * Az
                Ay = a3[KY] - sy * Az
                Bx = b3[KX] - sx * Bz
                By = b3[KY] - sy * Bz
                Cx = c3[KX] - sx * Cz
                Cy = c3[KY] - sy * Cz
            U = Cx * By - Cy * Bx
            V = Ax * Cy - Ay * Cx
            W = Bx * Ay - By * Ax
            if refit_exact:
                zmask = (U == 0.0) | (V == 0.0) | (W == 0.0)
                U = jnp.where(zmask, prod_diff(Cx, By, Cy, Bx), U)
                V = jnp.where(zmask, prod_diff(Ax, Cy, Ay, Cx), V)
                W = jnp.where(zmask, prod_diff(Bx, Ay, By, Ax), W)
            if cull_back_face:
                edge_ok = jnp.minimum(jnp.minimum(U, V), W) >= 0.0
            else:
                edge_ok = (jnp.minimum(jnp.minimum(U, V), W) >= 0.0) | (
                    jnp.maximum(jnp.maximum(U, V), W) <= 0.0
                )
            det = U + V + W
            rcp = 1.0 / det
            tt = (U * (sz * Az) + V * (sz * Bz) + W * (sz * Cz)) * rcp
            valid = (pid_t == p_b) & edge_ok & (ti < cnt)
            valid = valid & (tt <= max_t) & (tt >= min_t)
            t_b = jnp.where(valid, tt, t_b)
            u_b = jnp.where(valid, V * rcp, u_b)
            v_b = jnp.where(valid, W * rcp, v_b)
        return t_b, u_b, v_b, p_b

    def run_refit(carry):
        """Replay every drained leaf row (recorded in rq_ref during the
        traversal) through the watertight evaluator, streaming raw rows
        from the HBM-resident table in waves of RF_NW pipelined fetches
        (a per-row semaphore array sized to the whole queue crashes the
        Mosaic compiler; a typical packet drains ~11-17 rows, so most
        packets are a single wave)."""
        nq = jnp.minimum(rq_ref[0], RQ_CAP)

        def _dma(i, slot):
            return pltpu.make_async_copy(
                rleafs_ref.at[pl.ds(rq_ref[1 + i] >> 4, 1)],
                rbuf.at[pl.ds(slot, 1)],
                rsems.at[slot],
            )

        def wave(base, carry):
            cnt = jnp.minimum(nq - base, RF_NW)

            def _start(k, x):
                _dma(base + k, k).start()
                return x

            jax.lax.fori_loop(0, cnt, _start, 0)

            def body(k, carry):
                i = base + k
                _dma(i, k).wait()
                packed = rq_ref[1 + i]
                return refit_row(rbuf[pl.ds(k, 1), :], packed & 15, carry)

            return jax.lax.fori_loop(0, cnt, body, carry)

        def outer(state):
            base = state[0]
            carry = wave(base, state[1:])
            return (base + RF_NW,) + tuple(carry)

        fin = jax.lax.while_loop(
            lambda st: st[0] < nq, outer, (jnp.int32(0),) + tuple(carry)
        )
        return fin[1:]

    MM = f32(1.00000024)

    # ------------------------------------------------------------------
    # Two-phase loop. Profiling showed per-child pl.when blocks dominate
    # (each scalar-conditional region around vector code costs a pipeline
    # bubble; a packet executes ~700 of them). Phase A pops nodes and
    # writes *unconditionally* into the SMEM stack / leaf queue — a write
    # at the current top that isn't accompanied by a pointer bump is dead
    # and harmlessly overwritten — so the only conditionals are the two
    # scalar while conditions. Phase B drains the leaf queue with the
    # t/u/v/pid accumulators carried in vector registers.
    # ------------------------------------------------------------------
    LQ_CAP = lq_cap
    RQ_CAP = 1023  # refit replay queue slots (index clamp keeps an
    # overflowing packet fault-free; slot RQ_CAP is sacrificial)
    RF_NW = 48  # refit stream wave: in-flight DMA slots per replay wave

    if debug_counts:
        leafq_ref[60] = 0  # node pops (slack SMEM slots as counters,
        leafq_ref[61] = 0  # leaf drains — above any reachable queue index)

    # 16-wide nodes use the dense single-row layout (collapse_bvh16):
    # exact f32 boxes at lanes [6w, 6w+6), metas 96+w, counts 112+w
    # (order axis folded into the child-0 count lane as cnt + 16*axis)
    packed16 = width == 16
    NR = 1 if packed16 else width // 8  # rows per node
    if nodes_hi_ref is not None:  # park node: empty boxes never hit
        dummy_idx = (n_node_lo + nodes_hi_ref.shape[0]) // NR - 1
    else:
        dummy_idx = nodes_ref.shape[0] // NR - 1

    def _fetch_row(idx, slot):
        """Fetch node id ``idx``'s row block as a (NR, 128) read — one
        contiguous dynamic slice regardless of width."""
        if hbm_nodes:
            dma = pltpu.make_async_copy(
                nodes_ref.at[pl.ds(idx * NR, NR)],
                node_buf.at[pl.ds(slot * NR, NR)],
                node_sem,
            )
            dma.start()
            dma.wait()
            return node_buf[pl.ds(slot * NR, NR), :]  # (NR, 128)
        if nodes_hi_ref is not None:
            # split node table (backend-fault probe: large single tables
            # fault pop_n>2 / lq_cap>2 kernels on v5e) — row idx < n_node_lo
            # lives in the low table, the rest in the high one
            ilo = jnp.minimum(idx, n_node_lo - 1)
            ihi = jnp.maximum(idx - n_node_lo, 0)
            rlo = nodes_ref[pl.ds(ilo, 1), :]
            rhi = nodes_hi_ref[pl.ds(ihi, 1), :]
            return jnp.where(idx < n_node_lo, rlo, rhi)
        return nodes_ref[pl.ds(idx * NR, NR), :]  # (NR, 128)

    def _slab8(rowblk, t_b, base):
        """Slab-test all ``width`` children of one node block (NR, 128);
        returns their hit bits ORed at ``base``."""
        m = None
        for w in range(width):
            if packed16:
                row = rowblk[0:1]
                b0x, b0y, b0z = (row[0, 6 * w], row[0, 6 * w + 1],
                                 row[0, 6 * w + 2])
                b1x, b1y, b1z = (row[0, 6 * w + 3], row[0, 6 * w + 4],
                                 row[0, 6 * w + 5])
            else:
                rr, cc = divmod(w, 8)
                row = rowblk[rr : rr + 1]
                b0x, b0y, b0z = row[0, 8 * cc], row[0, 8 * cc + 1], row[0, 8 * cc + 2]
                b1x, b1y, b1z = row[0, 8 * cc + 3], row[0, 8 * cc + 4], row[0, 8 * cc + 5]
            if shared_origin:
                # subtract-then-select: (bound - origin) are scalar-unit
                # subtractions of the exact same f32 values, so the
                # selected per-ray slab distances are bit-identical to
                # the select-then-subtract vector form
                t0x = jnp.where(snx, b1x - osx, b0x - osx) * ix
                t0y = jnp.where(sny, b1y - osy, b0y - osy) * iy
                t0z = jnp.where(snz, b1z - osz, b0z - osz) * iz
                t1x = jnp.where(snx, b0x - osx, b1x - osx) * ix * MM
                t1y = jnp.where(sny, b0y - osy, b1y - osy) * iy * MM
                t1z = jnp.where(snz, b0z - osz, b1z - osz) * iz * MM
            else:
                lox = jnp.where(snx, b1x, b0x)
                hix = jnp.where(snx, b0x, b1x)
                loy = jnp.where(sny, b1y, b0y)
                hiy = jnp.where(sny, b0y, b1y)
                loz = jnp.where(snz, b1z, b0z)
                hiz = jnp.where(snz, b0z, b1z)
                t0x = (lox - ox) * ix
                t0y = (loy - oy) * iy
                t0z = (loz - oz) * iz
                t1x = (hix - ox) * ix * MM
                t1y = (hiy - oy) * iy * MM
                t1z = (hiz - oz) * iz * MM
            tmin = min_t
            tmin = jnp.where(t0x > tmin, t0x, tmin)
            tmin = jnp.where(t0y > tmin, t0y, tmin)
            tmin = jnp.where(t0z > tmin, t0z, tmin)
            tmax = t_b
            tmax = jnp.where(t1x < tmax, t1x, tmax)
            tmax = jnp.where(t1y < tmax, t1y, tmax)
            tmax = jnp.where(t1z < tmax, t1z, tmax)
            hit_c = (tmin <= tmax).astype(jnp.int32) << (base + w)
            m = hit_c if m is None else m | hit_c
        return m

    def _push8(rowblk, mask, base, sp, lq):
        # near-first pop order: children are build-sorted near-to-far
        # along the node's order axis (bvh8.py lane 80); LIFO stack means
        # push far-first, so iterate descending for positive direction
        # and ascending for negative.
        if packed16:
            # order axis folded into the child-0 count lane: cnt + 16*axis
            v112 = rowblk[0, 112]
            neg = jnp.where(
                v112 >= 32.0, neg_ax[2],
                jnp.where(v112 >= 16.0, neg_ax[1], neg_ax[0]),
            )
        else:
            axis_f = rowblk[0, 80]
            neg = jnp.where(
                axis_f == 0.0, neg_ax[0],
                jnp.where(axis_f == 1.0, neg_ax[1], neg_ax[2]),
            )
        for j in range(width):
            jd = width - 1 - j
            cc = jnp.where(neg, j, jd)
            bit = (mask >> (base + cc)) & 1
            if packed16:
                meta = jnp.where(
                    neg, rowblk[0, 96 + j], rowblk[0, 96 + jd]
                ).astype(jnp.int32)
                cnt = jnp.where(
                    neg, rowblk[0, 112 + j], rowblk[0, 112 + jd]
                ).astype(jnp.int32)
            else:
                ra, ca = divmod(j, 8)
                rd, cd = divmod(jd, 8)
                meta = jnp.where(
                    neg, rowblk[ra, 64 + ca], rowblk[rd, 64 + cd]
                ).astype(jnp.int32)
                cnt = jnp.where(
                    neg, rowblk[ra, 72 + ca], rowblk[rd, 72 + cd]
                ).astype(jnp.int32)
            internal = (meta >= 0).astype(jnp.int32)
            # unconditional writes; pointers advance only when the child
            # is a hit of the matching kind
            stack_ref[sp] = meta
            sp = sp + bit * internal
            leafq_ref[lq] = ((-meta - 1) << 4) | (cnt & 15)
            lq = lq + bit * (1 - internal)
        return sp, lq

    def node_step(c):
        sp, lq, t_b = c
        if debug_counts:
            leafq_ref[60] = leafq_ref[60] + 1
        sp = sp - 1
        idx = stack_ref[sp]
        rows = [_fetch_row(idx, 0)]
        # pop up to pop_n-1 further entries when available (dummy row
        # otherwise): 8*pop_n slab tests share ONE mask reduction +
        # scalar sync — the ~800ns vector->scalar sync per step is the
        # node-phase cost
        for k in range(1, pop_n):
            hask = (sp > 0).astype(jnp.int32)
            sp = sp - hask
            idxk = jnp.where(hask == 1, stack_ref[sp], dummy_idx)
            rows.append(_fetch_row(idxk, k))
        m = _slab8(rows[0], t_b, 0)
        for k in range(1, pop_n):
            m = m | _slab8(rows[k], t_b, width * k)
        # OR-reduce across the tile (VPU roll tree), ONE scalar move
        for sh in (64, 32, 16, 8, 4, 2, 1):
            m = m | pltpu.roll(m, sh, axis=1)
        sub_n = m.shape[0]
        sh = 1
        while sh < sub_n:
            m = m | pltpu.roll(m, sh, axis=0)
            sh *= 2
        mask = m[0, 0]

        # push later-popped (farther) nodes' children first so the
        # nearest node's children pop first
        for k in range(pop_n - 1, 0, -1):
            sp, lq = _push8(rows[k], mask, width * k, sp, lq)
        sp, lq = _push8(rows[0], mask, 0, sp, lq)
        return sp, lq, t_b

    # ------------------------------------------------------------------
    # Frustum node phase (closest-hit only): the per-ray slab vote is
    # OR-reduced to one packet bit anyway, so a CONSERVATIVE per-packet
    # interval test gives the same visit decision without any vector work
    # or vector->scalar sync. The packet's origin/inv-dir interval bounds
    # arrive precomputed (XLA-side, one reduce over the megabatch) in an
    # SMEM row; the node phase then runs entirely on the scalar unit:
    # float lane extracts of the node row + ~30 scalar flops per child.
    # Per-ray precision is preserved where it matters — the leaf tests.
    # The packet's t upper bound T (max over rays of best-t) is refreshed
    # from the vector accumulator every t_sync_every drain batches (one
    # sync each; stale T is conservative, never wrong).
    # ------------------------------------------------------------------
    if frustum:
        f_olo = tuple(pkt_ref[0, ax] for ax in range(3))
        f_ohi = tuple(pkt_ref[0, 3 + ax] for ax in range(3))
        f_ilo = tuple(pkt_ref[0, 6 + ax] for ax in range(3))
        f_ihi = tuple(pkt_ref[0, 9 + ax] for ax in range(3))
        f_mlo = pkt_ref[0, 12]
        f_t0 = pkt_ref[0, 13]
        f_coh = pkt_ref[0, 14]

    def node_step_frustum(c):
        sp, lq, T = c
        if debug_counts:
            leafq_ref[60] = leafq_ref[60] + 1
        sp = sp - 1
        idx = stack_ref[sp]
        row = _fetch_row(idx, 0)
        mask = None
        for cc in range(8):
            tmin = f_mlo
            tmax = T
            # empty slots carry inverted boxes; the per-ray slab fails
            # them via sign-ordered lo/hi selection, but a naive interval
            # product does NOT (products of two huge opposite-sign
            # endpoints span everything) — reject them explicitly, or an
            # empty slot's meta (0.0) gets pushed as "internal node 0"
            # and the traversal re-pushes the root forever
            live = row[0, 8 * cc] <= row[0, 8 * cc + 3]
            for ax in range(3):
                slo = row[0, 8 * cc + ax] - f_ohi[ax]
                shi = row[0, 8 * cc + 3 + ax] - f_olo[ax]
                p1 = slo * f_ilo[ax]
                p2 = slo * f_ihi[ax]
                p3 = shi * f_ilo[ax]
                p4 = shi * f_ihi[ax]
                tlo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
                thi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
                tmin = jnp.maximum(tmin, tlo)
                tmax = jnp.minimum(tmax, thi * MM)
            bit = ((tmin <= tmax) & live).astype(jnp.int32) << cc
            mask = bit if mask is None else mask | bit
        sp, lq = _push8(row, mask, 0, sp, lq)
        return sp, lq, T

    # ------------------------------------------------------------------
    # Lane-parallel frustum node phase (width 16, dense single-row
    # nodes). The r3 scalar frustum LOST to the per-ray vector vote
    # because ~30 scalar flops x 8 children serialized against the VPU;
    # this variant computes ALL 16 children's conservative interval
    # tests in ~30 VPU ops on the (1, 128) node row itself — child w's
    # slab bounds live at lanes [6w, 6w+6), so per-lane arithmetic with
    # packet-constant interval vectors + lane rolls yields each child's
    # (tmin, tmax) at lane 6w. vs the per-ray vote that is ~17 vector
    # ops x 32 children on (sub, 128) tiles per pop — two orders of
    # magnitude less VPU work per node. Records stay bit-identical:
    # the node phase only picks a CONSERVATIVE visit superset (an
    # extra-visited leaf can never produce an accepted hit — its tmin
    # exceeded every ray's current t bound) and the push order is the
    # same near-first order as the per-ray phase.
    # ------------------------------------------------------------------
    if frustum and packed16:
        _lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        _mod6 = _lane % 6
        _ax = jnp.where(_mod6 >= 3, _mod6 - 3, _mod6)
        _is_hi = _mod6 >= 3

        def _sel3(v):
            return jnp.where(_ax == 0, v[0],
                             jnp.where(_ax == 1, v[1], v[2]))

        # slo = b0 - ohi (at b0 lanes), shi = b1 - olo (at b1 lanes)
        _oref_l = jnp.where(_is_hi, _sel3(f_olo), _sel3(f_ohi))
        _i1_l = _sel3(f_ilo)
        _i2_l = _sel3(f_ihi)
        _wt_l = jnp.where(
            (_mod6 == 0) & (_lane < 96),
            jax.lax.shift_left(jnp.int32(1), _lane // 6),
            0,
        )

    def _ftest16(row, T):
        """Conservative interval test of all 16 children of one (1, 128)
        node row: bit w set at every lane iff child w's frustum interval
        is non-empty. ~20 (1, 128) VPU ops per node.

        Interval product per lane: [slo,shi] x [ilo,ihi] needs the
        min/max of 4 products; lanes 6w+a carry slo*i1, slo*i2 and
        lanes 6w+3+a carry shi*i1, shi*i2 — one roll combines them."""
        s = row - _oref_l
        p1 = s * _i1_l
        p2 = s * _i2_l
        lo = jnp.minimum(p1, p2)
        hi = jnp.maximum(p1, p2)
        lo = jnp.minimum(lo, pltpu.roll(lo, ROLL_M3, axis=1))
        hi = jnp.maximum(hi, pltpu.roll(hi, ROLL_M3, axis=1))
        hi = hi * MM
        # fold the 3 axes down to lane 6w
        tmin = jnp.maximum(jnp.maximum(lo, pltpu.roll(lo, ROLL_M1, axis=1)),
                           pltpu.roll(lo, ROLL_M2, axis=1))
        tmax = jnp.minimum(jnp.minimum(hi, pltpu.roll(hi, ROLL_M1, axis=1)),
                           pltpu.roll(hi, ROLL_M2, axis=1))
        tmin = jnp.maximum(tmin, f_mlo)
        tmax = jnp.minimum(tmax, T)
        # empty slots carry inverted boxes (b0x > b1x): reject explicitly
        live = row <= pltpu.roll(row, ROLL_M3, axis=1)
        return jnp.where((tmin <= tmax) & live, _wt_l, 0)

    def node_step_frustum16(c):
        """Multi-pop lane-parallel frustum step: pop_n nodes per while
        iteration, tested in 2-node groups whose masks fold on the VPU;
        ALL group masks then read back-to-back — the vector->scalar
        pipeline drain (the ~us-class cost that sank both the r3 scalar
        frustum and the single-pop v1) is paid ~once for the whole
        group batch instead of once per node."""
        sp, lq, T = c
        if debug_counts:
            leafq_ref[60] = leafq_ref[60] + 1
        sp = sp - 1
        rows = [_fetch_row(stack_ref[sp], 0)[0:1]]
        for k in range(1, fr_pop_n):
            hask = (sp > 0).astype(jnp.int32)
            sp = sp - hask
            idxk = jnp.where(hask == 1, stack_ref[sp], dummy_idx)
            rows.append(_fetch_row(idxk, k)[0:1])
        mvecs = []
        for g in range(0, fr_pop_n, 2):
            mv = _ftest16(rows[g], T)
            if g + 1 < fr_pop_n:
                mv = mv | (_ftest16(rows[g + 1], T) << 16)
            for sh in (64, 32, 16, 8, 4, 2, 1):
                mv = mv | pltpu.roll(mv, sh, axis=1)
            mvecs.append(mv)
        masks = [mv[0, 0] for mv in mvecs]
        # push farther-popped nodes' children first (near-first pops)
        for g in range(len(masks) - 1, -1, -1):
            if 2 * g + 1 < fr_pop_n:
                sp, lq = _push8(rows[2 * g + 1], masks[g], 16, sp, lq)
            sp, lq = _push8(rows[2 * g], masks[g], 0, sp, lq)
        return sp, lq, T

    def _fold_max_scalar(x):
        for sh in (64, 32, 16, 8, 4, 2, 1):
            x = jnp.maximum(x, pltpu.roll(x, sh, axis=1))
        sh = 1
        while sh < x.shape[0]:
            x = jnp.maximum(x, pltpu.roll(x, sh, axis=0))
            sh *= 2
        return x[0, 0]

    def run_pass(exact: bool, collect: bool):
        """One full traversal of the packet; returns the final carry."""
        leaf_fn = make_leaf_test(exact, collect)

        def _leaf_dma(q):
            packed = leafq_ref[q]
            return pltpu.make_async_copy(
                leafs_ref.at[pl.ds(packed >> 4, 1)],
                leaf_bufs.at[pl.ds(q, 1)],
                leaf_sems.at[q],
            )

        def drain_body(q, carry):
            if debug_counts:
                leafq_ref[61] = leafq_ref[61] + 1
            packed = leafq_ref[q]
            if refit:
                cq = rq_ref[0]
                rq_ref[jnp.minimum(cq + 1, RQ_CAP)] = packed
                rq_ref[0] = cq + 1
            if hbm_leafs:
                _leaf_dma(q).wait()
                lrow = leaf_bufs[pl.ds(q, 1), :]
            elif leafs_hi_ref is not None:
                li = packed >> 4
                llo = leafs_ref[pl.ds(jnp.minimum(li, n_leaf_lo - 1), 1), :]
                lhi = leafs_hi_ref[
                    pl.ds(jnp.maximum(li - n_leaf_lo, 0), 1), :
                ]
                lrow = jnp.where(li < n_leaf_lo, llo, lhi)
            else:
                lrow = leafs_ref[pl.ds(packed >> 4, 1), :]
            return leaf_fn(lrow, packed & 15, carry)

        def _start_queued(lq):
            if hbm_leafs:
                # start every queued row's fetch first so the copies
                # pipeline; each drain then waits only its own slot
                def start_one(q, x):
                    _leaf_dma(q).start()
                    return x
                jax.lax.fori_loop(0, lq, start_one, 0)

        init = [max_t, jnp.zeros_like(max_t), jnp.zeros_like(max_t),
                jnp.full(max_t.shape, -1, jnp.int32)]
        if collect:
            init.append(jnp.zeros(max_t.shape, jnp.int32))

        def outer_perray(state):
            sp = state[0]
            acc = state[1:]
            sp, lq, _ = jax.lax.while_loop(
                lambda c: (c[0] > 0) & (c[1] < LQ_CAP),
                node_step,
                (sp, jnp.int32(0), acc[0]),
            )
            _start_queued(lq)
            acc = jax.lax.fori_loop(0, lq, drain_body, acc)
            return (sp,) + tuple(acc)

        def run_perray():
            fin = jax.lax.while_loop(
                lambda st: st[0] > 0, outer_perray, (jnp.int32(1), *init)
            )
            return fin[1:]

        if not frustum:
            return run_perray()

        frustum_step = node_step_frustum16 if packed16 else node_step_frustum

        def outer_frustum(state):
            sp, it, T = state[0], state[1], state[2]
            acc = state[3:]
            sp, lq, T = jax.lax.while_loop(
                lambda c: (c[0] > 0) & (c[1] < LQ_CAP),
                frustum_step,
                (sp, jnp.int32(0), T),
            )
            _start_queued(lq)
            acc = jax.lax.fori_loop(0, lq, drain_body, acc)
            it = it + 1
            if t_sync_every != 0:
                # tighten T from the per-ray accumulator. Each tighten
                # is a vector->scalar read, which stalls the scalar
                # unit's runahead (the TPU scalar core issues ahead of
                # the VPU; with no such reads the whole scalar node
                # phase overlaps the vector drains) — so positive
                # values sync every N drain batches, NEGATIVE values
                # sync exactly once at batch N and never again
                # (ordered near-first traversal makes the first few
                # batches carry most of the final t). Degenerate rays
                # (sanitized to min_t=+inf) report t=+inf and must not
                # pin T there.
                def _tighten():
                    live = mint_ref[:] < inf
                    tb = jnp.where(live, acc[0], -inf)
                    return jnp.minimum(T, _fold_max_scalar(tb))

                if t_sync_every > 0:
                    do = it % t_sync_every == 0
                else:
                    do = it == -t_sync_every
                T = jax.lax.cond(do, _tighten, lambda: T)
            return (sp, it, T) + tuple(acc)

        def run_frustum():
            fin = jax.lax.while_loop(
                lambda st: st[0] > 0,
                outer_frustum,
                (jnp.int32(1), jnp.int32(0), f_t0, *init),
            )
            return fin[3:]

        # per-packet engine choice: the frustum interval vote is only
        # efficient when the packet is genuinely coherent (tight
        # direction cone + small origin box — the XLA-side bit in the
        # pkt row); a hemisphere-sampled bounce packet would make the
        # conservative frustum cover most of the tree. Incoherent
        # packets take the per-ray vote, whose union is exact.
        return jax.lax.cond(f_coh > 0, run_frustum, run_perray)

    if inkernel_exact:
        # pass 1: fast edges (no Dekker recompute), flag rays that hit a
        # zero edge function on any in-range triangle — exactly the rays
        # whose record COULD differ under the exact recompute
        t_b, u_b, v_b, p_b, z_b = run_pass(exact=False, collect=True)
        t_out[:] = t_b
        u_out[:] = u_b
        v_out[:] = v_b
        pid_out[:] = p_b
        # fold the flag to ONE scalar (a single extra sync per packet)
        for sh in (64, 32, 16, 8, 4, 2, 1):
            z_b = z_b | pltpu.roll(z_b, sh, axis=1)
        sub_n = z_b.shape[0]
        sh = 1
        while sh < sub_n:
            z_b = z_b | pltpu.roll(z_b, sh, axis=0)
            sh *= 2
        zf = z_b[0, 0]

        # pass 2 (rare): whole-packet retrace with exact edges, same
        # kernel invocation — no host round trip (the two-pass host
        # variant lost its 11% kernel win to tunnel orchestration)
        @pl.when(zf != 0)
        def _retrace():
            stack_ref[0] = root0  # pass 1 may have overwritten slot 0
            t2, u2, v2, p2 = run_pass(exact=True, collect=False)
            t_out[:] = t2
            u_out[:] = u2
            v_out[:] = v2
            pid_out[:] = p2
        return

    fin = run_pass(exact=exact_edge_fallback, collect=flag_zero_edges)
    if refit:
        fin = run_refit(fin[:4])
    t_b, u_b, v_b, p_b = fin[:4]
    if flag_zero_edges:
        z_out[:] = fin[4]
    t_out[:] = t_b
    if debug_counts:
        # debug mode: u/v carry the per-packet visit counters instead
        u_out[:] = jnp.full(u_b.shape, leafq_ref[60].astype(f32))
        v_out[:] = jnp.full(v_b.shape, leafq_ref[61].astype(f32))
    else:
        u_out[:] = u_b
        v_out[:] = v_b
    pid_out[:] = p_b


def _kernel_body_il(
    nodes_ref,
    leafs_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    mint_ref, maxt_ref,
    skip_ref,
    pkt_ref,
    t_out, u_out, v_out, pid_out,
    stack_ref, leafq_ref,
    *,
    K: int,
    cull_back_face: bool,
    exact_edge_fallback: bool,
    use_skip: bool,
    stack_size: int,
    leaf_unroll: int,
    pop_n: int,
    occlusion: bool,
    prim_range: tuple | None,
    inkernel_exact: bool,
    lq_cap: int,
    intersector: str,
    kz_static: int | None,
    shared_origin: bool,
    uniform_sign: bool,
    width: int,
):
    """K-way interleaved packet traversal.

    One kernel instance owns K packets (ray blocks arrive as
    (K, sub, LANES)) and runs their traversals in LOCK-STEP: each
    node-phase iteration pops one node per still-active packet, slab
    tests each against its own rays, and reads the packets' visit masks
    back-to-back — so the ~0.8 us vector->scalar pipeline drain that
    dominates the node phase (see node_step) is paid ~once per K node
    steps instead of once each. Leaf drains interleave the same way:
    packet B's scalar row fetch issues while packet A's triangle tests
    occupy the VPU.

    Each packet's own pop/drain SEQUENCE is identical to the K=1 kernel
    (a packet whose queue is full or whose stack is empty idles on the
    all-miss park node, and idle pushes land one-past-top where the
    unconditional-write scheme already discards them), so records are
    bit-identical to the non-interleaved kernel. Measured basis:
    tools/experiments/profile_interleave.py (926 ns per dual node step
    vs 810 single on v5e; the microbench's apparent iteration blowup was
    a restart-from-root artifact of its unguarded idle pops — fixed here
    by gating pops on packet activity).

    Supports the benchmark-class configs (VMEM scene, watertight/woop,
    packed16 or BVH8 rows, batch specializations, occlusion, in-kernel
    two-pass exact edges). Frustum/HBM-streaming/refit/split-table modes
    stay on the K=1 body.
    """
    f32 = jnp.float32
    eps = f32(np.finfo(np.float32).eps)
    inf = f32(np.inf)
    BIG = f32(3.0e38)
    MM = f32(1.00000024)
    C = f32(4097.0)
    LQ_CAP = lq_cap
    packed16 = width == 16
    NR = 1 if packed16 else width // 8
    dummy_idx = nodes_ref.shape[0] // NR - 1
    SBASE = [s * stack_size for s in range(K)]
    QBASE = [s * 64 for s in range(K)]

    def comp(vx, vy, vz, k):
        return jnp.where(k == 0, vx, jnp.where(k == 1, vy, vz))

    def safe_inv2(d):
        tiny = jnp.abs(d) < eps
        neg = jax.lax.bitcast_convert_type(d, jnp.int32) < 0
        return jnp.where(
            tiny, jnp.where(neg, -inf, inf), 1.0 / jnp.where(tiny, 1.0, d)
        )

    def two_prod(a, b):
        p = a * b
        a1 = a * C
        ah = a1 - (a1 - a)
        al = a - ah
        b1 = b * C
        bh = b1 - (b1 - b)
        bl = b - bh
        err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        return p, err

    def prod_diff(a, b, c, d):
        p1, e1 = two_prod(a, b)
        p2, e2 = two_prod(c, d)
        return (p1 - p2) + (e1 - e2)

    def setup(s):
        """Per-packet ray constants — the same sanitize/inverse/shear
        pipeline as the K=1 body (see _kernel_body lines ~130-250),
        evaluated on this packet's (sub, LANES) slice."""
        S = {}
        ox, oy, oz = ox_ref[s, :, :], oy_ref[s, :, :], oz_ref[s, :, :]
        dx, dy, dz = dx_ref[s, :, :], dy_ref[s, :, :], dz_ref[s, :, :]
        min_t = mint_ref[s, :, :]
        max_t = maxt_ref[s, :, :]
        okr = (
            (jnp.abs(ox) < BIG) & (jnp.abs(oy) < BIG) & (jnp.abs(oz) < BIG)
            & (jnp.abs(dx) < BIG) & (jnp.abs(dy) < BIG)
            & (jnp.abs(dz) < BIG)
            & (jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz) > 0)
        )
        ox = jnp.where(okr, ox, 0.0)
        oy = jnp.where(okr, oy, 0.0)
        oz = jnp.where(okr, oz, 0.0)
        dx = jnp.where(okr, dx, 1.0)
        dy = jnp.where(okr, dy, 0.0)
        dz = jnp.where(okr, dz, 0.0)
        min_t = jnp.where(okr, min_t, inf)
        max_t = jnp.where(okr, max_t, inf)
        S.update(ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                 min_t=min_t, max_t=max_t)
        S.update(ix=safe_inv2(dx), iy=safe_inv2(dy), iz=safe_inv2(dz))
        if uniform_sign:
            S.update(snx=pkt_ref[s, 0, 23] > 0.5,
                     sny=pkt_ref[s, 0, 24] > 0.5,
                     snz=pkt_ref[s, 0, 25] > 0.5)
        else:
            S.update(snx=dx < 0, sny=dy < 0, snz=dz < 0)
        if intersector != "woop":
            if kz_static is None:
                adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
                kz = jnp.where(ady > adx, 1, 0)
                amax = jnp.where(ady > adx, ady, adx)
                kz = jnp.where(adz > amax, 2, kz).astype(jnp.int32)
                kx = (kz + 1) % 3
                ky = (kx + 1) % 3
                dkz = comp(dx, dy, dz, kz)
                negkz = dkz < 0
                kx, ky = (jnp.where(negkz, ky, kx),
                          jnp.where(negkz, kx, ky))
                S.update(kz=kz, kx=kx, ky=ky)
                S.update(sx=comp(dx, dy, dz, kx) / dkz,
                         sy=comp(dx, dy, dz, ky) / dkz,
                         sz=1.0 / dkz)
            else:
                KZ = kz_static
                KX = (KZ + 1) % 3
                KY = (KZ + 2) % 3
                d3 = (dx, dy, dz)
                dkz = d3[KZ]
                S.update(sx=d3[KX] / dkz, sy=d3[KY] / dkz, sz=1.0 / dkz)
        if shared_origin:
            S["os3"] = (pkt_ref[s, 0, 20], pkt_ref[s, 0, 21],
                        pkt_ref[s, 0, 22])
        if use_skip:
            S["skip_pid"] = skip_ref[s, :, :]
        S["neg_ax"] = (dx_ref[s, 0, 0] < 0, dy_ref[s, 0, 0] < 0,
                       dz_ref[s, 0, 0] < 0)
        return S

    sides = [setup(s) for s in range(K)]

    def _fetch(idx):
        return nodes_ref[pl.ds(idx * NR, NR), :]

    def _fold_or(m):
        for sh in (64, 32, 16, 8, 4, 2, 1):
            m = m | pltpu.roll(m, sh, axis=1)
        sh = 1
        while sh < m.shape[0]:
            m = m | pltpu.roll(m, sh, axis=0)
            sh *= 2
        return m

    def _slab(S, rowblk, t_b, base):
        # identical math to _kernel_body._slab8 on this packet's rays
        ox, oy, oz = S["ox"], S["oy"], S["oz"]
        ix, iy, iz = S["ix"], S["iy"], S["iz"]
        snx, sny, snz = S["snx"], S["sny"], S["snz"]
        min_t = S["min_t"]
        m = None
        for w in range(width):
            if packed16:
                row = rowblk[0:1]
                b0x, b0y, b0z = (row[0, 6 * w], row[0, 6 * w + 1],
                                 row[0, 6 * w + 2])
                b1x, b1y, b1z = (row[0, 6 * w + 3], row[0, 6 * w + 4],
                                 row[0, 6 * w + 5])
            else:
                rr, cc = divmod(w, 8)
                row = rowblk[rr : rr + 1]
                b0x, b0y, b0z = (row[0, 8 * cc], row[0, 8 * cc + 1],
                                 row[0, 8 * cc + 2])
                b1x, b1y, b1z = (row[0, 8 * cc + 3], row[0, 8 * cc + 4],
                                 row[0, 8 * cc + 5])
            if shared_origin:
                osx, osy, osz = S["os3"]
                t0x = jnp.where(snx, b1x - osx, b0x - osx) * ix
                t0y = jnp.where(sny, b1y - osy, b0y - osy) * iy
                t0z = jnp.where(snz, b1z - osz, b0z - osz) * iz
                t1x = jnp.where(snx, b0x - osx, b1x - osx) * ix * MM
                t1y = jnp.where(sny, b0y - osy, b1y - osy) * iy * MM
                t1z = jnp.where(snz, b0z - osz, b1z - osz) * iz * MM
            else:
                lox = jnp.where(snx, b1x, b0x)
                hix = jnp.where(snx, b0x, b1x)
                loy = jnp.where(sny, b1y, b0y)
                hiy = jnp.where(sny, b0y, b1y)
                loz = jnp.where(snz, b1z, b0z)
                hiz = jnp.where(snz, b0z, b1z)
                t0x = (lox - ox) * ix
                t0y = (loy - oy) * iy
                t0z = (loz - oz) * iz
                t1x = (hix - ox) * ix * MM
                t1y = (hiy - oy) * iy * MM
                t1z = (hiz - oz) * iz * MM
            tmin = min_t
            tmin = jnp.where(t0x > tmin, t0x, tmin)
            tmin = jnp.where(t0y > tmin, t0y, tmin)
            tmin = jnp.where(t0z > tmin, t0z, tmin)
            tmax = t_b
            tmax = jnp.where(t1x < tmax, t1x, tmax)
            tmax = jnp.where(t1y < tmax, t1y, tmax)
            tmax = jnp.where(t1z < tmax, t1z, tmax)
            hit_c = (tmin <= tmax).astype(jnp.int32) << (base + w)
            m = hit_c if m is None else m | hit_c
        return m

    def _push(s, rowblk, mask, base, sp, lq):
        neg_ax = sides[s]["neg_ax"]
        if packed16:
            v112 = rowblk[0, 112]
            neg = jnp.where(
                v112 >= 32.0, neg_ax[2],
                jnp.where(v112 >= 16.0, neg_ax[1], neg_ax[0]),
            )
        else:
            axis_f = rowblk[0, 80]
            neg = jnp.where(
                axis_f == 0.0, neg_ax[0],
                jnp.where(axis_f == 1.0, neg_ax[1], neg_ax[2]),
            )
        for j in range(width):
            jd = width - 1 - j
            cc = jnp.where(neg, j, jd)
            bit = (mask >> (base + cc)) & 1
            if packed16:
                meta = jnp.where(
                    neg, rowblk[0, 96 + j], rowblk[0, 96 + jd]
                ).astype(jnp.int32)
                cnt = jnp.where(
                    neg, rowblk[0, 112 + j], rowblk[0, 112 + jd]
                ).astype(jnp.int32)
            else:
                ra, ca = divmod(j, 8)
                rd, cd = divmod(jd, 8)
                meta = jnp.where(
                    neg, rowblk[ra, 64 + ca], rowblk[rd, 64 + cd]
                ).astype(jnp.int32)
                cnt = jnp.where(
                    neg, rowblk[ra, 72 + ca], rowblk[rd, 72 + cd]
                ).astype(jnp.int32)
            internal = (meta >= 0).astype(jnp.int32)
            stack_ref[SBASE[s] + sp] = meta
            sp = sp + bit * internal
            leafq_ref[QBASE[s] + lq] = ((-meta - 1) << 4) | (cnt & 15)
            lq = lq + bit * (1 - internal)
        return sp, lq

    def make_leaf_fn(exact: bool, collect: bool):
        if intersector == "woop":

            def leaf_woop(S, lrow, cnt, carry):
                t_b, u_b, v_b, p_b = carry
                dx, dy, dz = S["dx"], S["dy"], S["dz"]
                min_t = S["min_t"]
                rox, roy, roz = (S["os3"] if shared_origin
                                 else (S["ox"], S["oy"], S["oz"]))
                for ti in range(leaf_unroll):
                    ba = 12 * ti
                    rx = rox - lrow[0, ba + 9]
                    ry = roy - lrow[0, ba + 10]
                    rz = roz - lrow[0, ba + 11]
                    m20, m21, m22 = (lrow[0, ba + 6], lrow[0, ba + 7],
                                     lrow[0, ba + 8])
                    opz = m20 * rx + m21 * ry + m22 * rz
                    dpz = m20 * dx + m21 * dy + m22 * dz
                    rcp = 1.0 / dpz
                    tt = -opz * rcp
                    m00, m01, m02 = (lrow[0, ba], lrow[0, ba + 1],
                                     lrow[0, ba + 2])
                    uu = (m00 * rx + m01 * ry + m02 * rz
                          ) + tt * (m00 * dx + m01 * dy + m02 * dz)
                    m10, m11, m12 = (lrow[0, ba + 3], lrow[0, ba + 4],
                                     lrow[0, ba + 5])
                    vv = (m10 * rx + m11 * ry + m12 * rz
                          ) + tt * (m10 * dx + m11 * dy + m12 * dz)
                    pid_t = lrow[0, 108 + ti].astype(jnp.int32)
                    valid = (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                    valid = valid & (tt <= t_b) & (tt >= min_t) & (ti < cnt)
                    if cull_back_face:
                        valid = valid & (dpz < 0.0)
                    if use_skip:
                        valid = valid & (pid_t != S["skip_pid"])
                    if prim_range is not None:
                        valid = valid & (pid_t >= prim_range[0]) & (
                            pid_t < prim_range[1]
                        )
                    t_b = jnp.where(valid, tt, t_b)
                    u_b = jnp.where(valid, uu, u_b)
                    v_b = jnp.where(valid, vv, v_b)
                    p_b = jnp.where(valid, pid_t, p_b)
                    if occlusion:
                        t_b = jnp.where(valid, -tt - 1.0, t_b)
                return t_b, u_b, v_b, p_b

            return leaf_woop

        def leaf_wt(S, lrow, cnt, carry):
            if collect:
                t_b, u_b, v_b, p_b, z_b = carry
            else:
                t_b, u_b, v_b, p_b = carry
            min_t = S["min_t"]
            sx, sy, sz = S["sx"], S["sy"], S["sz"]
            ro3 = (S["os3"] if shared_origin
                   else (S["ox"], S["oy"], S["oz"]))
            for ti in range(leaf_unroll):
                p0x, p0y, p0z = (lrow[0, 9 * ti], lrow[0, 9 * ti + 1],
                                 lrow[0, 9 * ti + 2])
                p1x, p1y, p1z = (lrow[0, 9 * ti + 3], lrow[0, 9 * ti + 4],
                                 lrow[0, 9 * ti + 5])
                p2x, p2y, p2z = (lrow[0, 9 * ti + 6], lrow[0, 9 * ti + 7],
                                 lrow[0, 9 * ti + 8])
                pid_t = lrow[0, 90 + ti].astype(jnp.int32)
                a3 = (p0x - ro3[0], p0y - ro3[1], p0z - ro3[2])
                b3 = (p1x - ro3[0], p1y - ro3[1], p1z - ro3[2])
                c3 = (p2x - ro3[0], p2y - ro3[1], p2z - ro3[2])
                if kz_static is None:
                    kz, kx, ky = S["kz"], S["kx"], S["ky"]
                    Az = comp(*a3, kz)
                    Bz = comp(*b3, kz)
                    Cz = comp(*c3, kz)
                    Ax = comp(*a3, kx) - sx * Az
                    Ay = comp(*a3, ky) - sy * Az
                    Bx = comp(*b3, kx) - sx * Bz
                    By = comp(*b3, ky) - sy * Bz
                    Cx = comp(*c3, kx) - sx * Cz
                    Cy = comp(*c3, ky) - sy * Cz
                else:
                    KZ = kz_static
                    KX = (KZ + 1) % 3
                    KY = (KZ + 2) % 3
                    Az, Bz, Cz = a3[KZ], b3[KZ], c3[KZ]
                    Ax = a3[KX] - sx * Az
                    Ay = a3[KY] - sy * Az
                    Bx = b3[KX] - sx * Bz
                    By = b3[KY] - sy * Bz
                    Cx = c3[KX] - sx * Cz
                    Cy = c3[KY] - sy * Cz
                U = Cx * By - Cy * Bx
                V = Ax * Cy - Ay * Cx
                W = Bx * Ay - By * Ax
                if collect:
                    z_b = z_b | (
                        ((U == 0.0) | (V == 0.0) | (W == 0.0)) & (ti < cnt)
                    ).astype(jnp.int32)
                if exact:
                    zmask = (U == 0.0) | (V == 0.0) | (W == 0.0)
                    U = jnp.where(zmask, prod_diff(Cx, By, Cy, Bx), U)
                    V = jnp.where(zmask, prod_diff(Ax, Cy, Ay, Cx), V)
                    W = jnp.where(zmask, prod_diff(Bx, Ay, By, Ax), W)
                if cull_back_face:
                    edge_ok = jnp.minimum(jnp.minimum(U, V), W) >= 0.0
                else:
                    edge_ok = (
                        jnp.minimum(jnp.minimum(U, V), W) >= 0.0
                    ) | (jnp.maximum(jnp.maximum(U, V), W) <= 0.0)
                det = U + V + W
                rcp = 1.0 / det
                tt = (U * (sz * Az) + V * (sz * Bz) + W * (sz * Cz)) * rcp
                valid = edge_ok & (tt <= t_b) & (tt >= min_t)
                valid = valid & (ti < cnt)
                if use_skip:
                    valid = valid & (pid_t != S["skip_pid"])
                if prim_range is not None:
                    valid = valid & (pid_t >= prim_range[0]) & (
                        pid_t < prim_range[1]
                    )
                t_b = jnp.where(valid, tt, t_b)
                u_b = jnp.where(valid, V * rcp, u_b)
                v_b = jnp.where(valid, W * rcp, v_b)
                p_b = jnp.where(valid, pid_t, p_b)
                if occlusion:
                    t_b = jnp.where(valid, -tt - 1.0, t_b)
            if collect:
                return t_b, u_b, v_b, p_b, z_b
            return t_b, u_b, v_b, p_b

        return leaf_wt

    def _node_cond(c):
        w = (c[0] > 0) & (c[K] < LQ_CAP)
        for s in range(1, K):
            w = w | ((c[s] > 0) & (c[K + s] < LQ_CAP))
        return w

    def make_node_step(tbs):
        def node_step(c):
            sps = list(c[:K])
            lqs = list(c[K : 2 * K])
            rows_all = []
            mvecs = []
            for s in range(K):
                sp, lq = sps[s], lqs[s]
                # pops gate on packet ACTIVITY (stack non-empty AND
                # queue not full) — an idle packet pops the park node,
                # whose empty boxes produce zero mask bits, so its
                # pushes are the harmless one-past-top writes
                act = ((sp > 0) & (lq < LQ_CAP)).astype(jnp.int32)
                sp = sp - act
                idx = jnp.where(
                    act == 1, stack_ref[SBASE[s] + sp], dummy_idx
                )
                rows = [_fetch(idx)]
                for k in range(1, pop_n):
                    hask = act * (sp > 0).astype(jnp.int32)
                    sp = sp - hask
                    idxk = jnp.where(
                        hask == 1, stack_ref[SBASE[s] + sp], dummy_idx
                    )
                    rows.append(_fetch(idxk))
                sps[s] = sp
                m = _slab(sides[s], rows[0], tbs[s], 0)
                for k in range(1, pop_n):
                    m = m | _slab(sides[s], rows[k], tbs[s], width * k)
                rows_all.append(rows)
                mvecs.append(m)
            nb = width * pop_n
            if nb * K <= 32:
                # all packets' visit bits fit one int32: ONE mask
                # reduction + ONE vector->scalar read for K node steps
                # (arithmetic >> is safe: _push reads bits 0..nb-1 of
                # each shifted mask, below any bit-31 sign smear)
                m = mvecs[0]
                for s in range(1, K):
                    m = m | (mvecs[s] << (nb * s))
                msc = _fold_or(m)[0, 0]
                masks = [msc >> (nb * s) for s in range(K)]
            else:
                # per-packet reductions, scalar reads BACK-TO-BACK: the
                # scalar unit stalls once for the batch (packet B's slab
                # work ran while A's read drained the pipeline)
                mvecs = [_fold_or(m) for m in mvecs]
                masks = [mv[0, 0] for mv in mvecs]
            for s in range(K):
                sp, lq = sps[s], lqs[s]
                for k in range(pop_n - 1, 0, -1):
                    sp, lq = _push(s, rows_all[s][k], masks[s],
                                   width * k, sp, lq)
                sp, lq = _push(s, rows_all[s][0], masks[s], 0, sp, lq)
                sps[s], lqs[s] = sp, lq
            return (*sps, *lqs)

        return node_step

    def run_pass(exact: bool, collect: bool):
        leaf_fn = make_leaf_fn(exact, collect)
        nacc = 5 if collect else 4

        def make_drain(lqs):
            def drain_pair(q, flat):
                accs = [list(flat[s * nacc : (s + 1) * nacc])
                        for s in range(K)]
                out = []
                for s in range(K):
                    # a packet whose queue is shorter gets cnt=0 (row 0
                    # fetched, zero triangles accepted) — wasted VPU
                    # lanes that overlap the longer packet's real work
                    has = (q < lqs[s]).astype(jnp.int32)
                    packed = leafq_ref[QBASE[s] + q] * has
                    cnt = (packed & 15) * has
                    lrow = leafs_ref[pl.ds(packed >> 4, 1), :]
                    out.extend(leaf_fn(sides[s], lrow, cnt,
                                       tuple(accs[s])))
                return tuple(out)

            return drain_pair

        inits = []
        for s in range(K):
            mt = sides[s]["max_t"]
            ini = [mt, jnp.zeros_like(mt), jnp.zeros_like(mt),
                   jnp.full(mt.shape, -1, jnp.int32)]
            if collect:
                ini.append(jnp.zeros(mt.shape, jnp.int32))
            inits.append(ini)

        def outer(state):
            sps = state[:K]
            flat = state[K:]
            tbs = [flat[s * nacc] for s in range(K)]
            carry = jax.lax.while_loop(
                _node_cond,
                make_node_step(tbs),
                (*sps, *([jnp.int32(0)] * K)),
            )
            sps = carry[:K]
            lqs = carry[K : 2 * K]
            lmax = lqs[0]
            for s in range(1, K):
                lmax = jnp.maximum(lmax, lqs[s])
            flat = jax.lax.fori_loop(0, lmax, make_drain(lqs),
                                     tuple(flat))
            return (*sps, *flat)

        def _outer_cond(st):
            w = st[0] > 0
            for s in range(1, K):
                w = w | (st[s] > 0)
            return w

        st0 = tuple([jnp.int32(1)] * K) + tuple(
            x for ini in inits for x in ini
        )
        fin = jax.lax.while_loop(_outer_cond, outer, st0)
        return [list(fin[K + s * nacc : K + (s + 1) * nacc])
                for s in range(K)]

    def _write(accs):
        for s in range(K):
            t_out[s, :, :] = accs[s][0]
            u_out[s, :, :] = accs[s][1]
            v_out[s, :, :] = accs[s][2]
            pid_out[s, :, :] = accs[s][3]

    for s in range(K):
        stack_ref[SBASE[s]] = 0

    if inkernel_exact:
        accs = run_pass(exact=False, collect=True)
        _write(accs)
        z = accs[0][4]
        for s in range(1, K):
            z = z | accs[s][4]
        zf = _fold_or(z)[0, 0]

        @pl.when(zf != 0)
        def _retrace():
            for s in range(K):
                stack_ref[SBASE[s]] = 0
            _write(run_pass(exact=True, collect=False))

        return

    _write(run_pass(exact=exact_edge_fallback, collect=False))


@functools.lru_cache(maxsize=32)
def _make_kernel(
    n_packets: int,
    sub: int,
    cull_back_face: bool,
    exact_edge_fallback: bool,
    use_skip: bool,
    stack_size: int,
    vmem_mb: int,
    leaf_unroll: int,
    pop_n: int,
    occlusion: bool,
    prim_range: tuple | None = None,
    inkernel_exact: bool = False,
    hbm_nodes: bool = False,
    hbm_leafs: bool = False,
    use_roots: bool = False,
    frustum: bool = False,
    t_sync_every: int = 2,
    lq_cap: int = 1,
    intersector: str = "watertight",
    debug_counts: bool = False,
    flag_zero_edges: bool = False,
    kz_static: int | None = None,
    shared_origin: bool = False,
    uniform_sign: bool = False,
    node_split: int = 0,
    leaf_split: int = 0,
    width: int = 8,
    fr_pop_n: int = 2,
    refit: bool = False,
    refit_exact: bool = False,
    oracle_t: bool = False,
    interleave: int = 1,
    interpret: bool = False,
):
    if interleave > 1:
        # K-way interleaved body: K packets per grid step (see
        # _kernel_body_il); benchmark-class configs only — callers gate
        body = functools.partial(
            _kernel_body_il,
            K=interleave,
            cull_back_face=cull_back_face,
            exact_edge_fallback=exact_edge_fallback,
            use_skip=use_skip,
            stack_size=stack_size,
            leaf_unroll=leaf_unroll,
            pop_n=pop_n,
            occlusion=occlusion,
            prim_range=prim_range,
            inkernel_exact=inkernel_exact,
            lq_cap=lq_cap,
            intersector=intersector,
            kz_static=kz_static,
            shared_origin=shared_origin,
            uniform_sign=uniform_sign,
            width=width,
        )
        ray_spec = pl.BlockSpec((interleave, sub, LANES),
                                lambda i: (i, 0, 0))
        pkt_spec = pl.BlockSpec((interleave, 1, LANES),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        return jax.jit(pl.pallas_call(
            body,
            grid=(n_packets // interleave,),
            in_specs=[vmem, vmem] + [ray_spec] * 9 + [pkt_spec],
            out_specs=(ray_spec,) * 4,
            out_shape=tuple(
                jax.ShapeDtypeStruct((n_packets, sub, LANES), d)
                for d in (jnp.float32, jnp.float32, jnp.float32,
                          jnp.int32)
            ),
            scratch_shapes=[
                pltpu.SMEM((interleave * stack_size,), jnp.int32),
                pltpu.SMEM((interleave * 64,), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024,
            ),
            interpret=interpret,
        ))
    inner = functools.partial(
        _kernel_body,
        cull_back_face=cull_back_face,
        exact_edge_fallback=exact_edge_fallback,
        use_skip=use_skip,
        stack_size=stack_size,
        leaf_unroll=leaf_unroll,
        pop_n=pop_n,
        occlusion=occlusion,
        prim_range=prim_range,
        inkernel_exact=inkernel_exact,
        hbm_nodes=hbm_nodes,
        hbm_leafs=hbm_leafs,
        use_roots=use_roots,
        frustum=frustum,
        t_sync_every=t_sync_every,
        lq_cap=lq_cap,
        intersector=intersector,
        debug_counts=debug_counts,
        flag_zero_edges=flag_zero_edges,
        kz_static=kz_static,
        shared_origin=shared_origin,
        uniform_sign=uniform_sign,
        width=width,
        fr_pop_n=fr_pop_n,
        refit=refit,
        refit_exact=refit_exact,
        oracle_t=oracle_t,
        n_node_lo=node_split,
        n_leaf_lo=leaf_split,
    )
    if node_split or leaf_split or refit:
        # input order: nodes_lo [nodes_hi] leafs_lo [leafs_hi] [rleafs]
        def body(*args):
            i = 1
            nodes_hi = args[i] if node_split else None
            i += 1 if node_split else 0
            leafs = args[i]
            i += 1
            leafs_hi = args[i] if leaf_split else None
            i += 1 if leaf_split else 0
            rleafs = args[i] if refit else None
            i += 1 if refit else 0
            inner(args[0], leafs, *args[i:],
                  nodes_hi_ref=nodes_hi, leafs_hi_ref=leafs_hi,
                  rleafs_ref=rleafs)
    else:
        body = inner
    ray_spec = pl.BlockSpec((None, sub, LANES), lambda i: (i, 0, 0))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    n_out = 5 if flag_zero_edges else 4
    out_dtypes = [jnp.float32, jnp.float32, jnp.float32, jnp.int32,
                  jnp.int32][:n_out]
    scratch = [
        pltpu.SMEM((stack_size,), jnp.int32),
        pltpu.SMEM((64,), jnp.int32),  # leaf queue (cap + 8 slack)
    ]
    if hbm_nodes:
        nr = 1 if width == 16 else width // 8  # packed16: one row/node
        scratch += [
            pltpu.VMEM((max(2, pop_n, fr_pop_n) * nr, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    if hbm_leafs:
        nq = lq_cap + width * pop_n  # worst-case queued rows, see above
        scratch += [
            pltpu.VMEM((nq, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((nq,)),
        ]
    if refit:
        scratch += [
            pltpu.SMEM((1024,), jnp.int32),  # replay queue (RQ_CAP+1)
            pltpu.VMEM((48, LANES), jnp.float32),  # RF_NW stream slots
            pltpu.SemaphoreType.DMA((48,)),
        ]
    # per-packet scalar row (frustum bounds + root) rides in a 128-lane
    # SMEM block; the (1, 128) trailing block shape matches the array's
    # trailing dims exactly, which is the only legal sub-8-sublane form
    pkt_spec = pl.BlockSpec((None, 1, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    table_specs = [hbm if hbm_nodes else vmem]
    if node_split:
        table_specs.append(vmem)
    table_specs.append(hbm if hbm_leafs else vmem)
    if leaf_split:
        table_specs.append(vmem)
    if refit:
        table_specs.append(hbm)  # raw leaf rows stream per replay
    grid_call = pl.pallas_call(
        body,
        grid=(n_packets,),
        in_specs=table_specs + [ray_spec] * 9 + [pkt_spec],
        out_specs=(ray_spec,) * n_out,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_packets, sub, LANES), d)
            for d in out_dtypes
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )
    return jax.jit(grid_call)


def _frustum_bounds(ox, oy, oz, dx, dy, dz, mint, maxt, scene_diag):
    """Per-packet conservative interval bounds for the frustum node phase.

    One XLA reduce over the prepped (n_packets, sub, LANES) ray tiles.
    Row layout, (n_packets, 16) f32:
      [0:3]  origin lower bound        [3:6]  origin upper bound
      [6:9]  inv-dir lower bound       [9:12] inv-dir upper bound
      [12]   min over rays of min_t    [13]   max over rays of max_t
      [14]   coherence bit: 1.0 when the packet's direction cone is
             tight (min cos to the mean direction >= ~15 deg) and its
             origin box is small vs the scene — the kernel only takes
             the frustum node phase then; hemisphere-sampled bounce
             packets fall back to the exact per-ray vote

    Degenerate rays (the ones the kernel sanitizes into guaranteed
    misses) are excluded from every fold; a packet of only degenerate
    rays gets T0 = -inf and visits nothing. Axes where any live ray's
    direction component is ~0 get a full-range inverse interval plus a
    widened origin interval, so the interval product can never falsely
    cull a box whose face-plane contains an axis-parallel ray (the
    per-ray robust test treats that axis as unconstrained via its
    NaN folds; the interval bound must stay a superset of it).
    """
    BIGF = jnp.float32(3.0e38)
    inf = jnp.float32(np.inf)
    eps = jnp.float32(np.finfo(np.float32).eps)
    okr = (
        (jnp.abs(ox) < BIGF) & (jnp.abs(oy) < BIGF) & (jnp.abs(oz) < BIGF)
        & (jnp.abs(dx) < BIGF) & (jnp.abs(dy) < BIGF) & (jnp.abs(dz) < BIGF)
        & (jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz) > 0)
    )

    def red_min(x, fill):
        return jnp.min(jnp.where(okr, x, fill), axis=(1, 2))

    def red_max(x, fill):
        return jnp.max(jnp.where(okr, x, fill), axis=(1, 2))

    o_los, o_his, i_los, i_his = [], [], [], []
    for o_c, d_c in ((ox, dx), (oy, dy), (oz, dz)):
        tiny = jnp.abs(d_c) < eps
        i_c = jnp.clip(
            jnp.where(
                tiny,
                jnp.where(d_c < 0, -BIGF, BIGF),
                1.0 / jnp.where(tiny, 1.0, d_c),
            ),
            -BIGF,
            BIGF,
        )
        tiny_any = jnp.any(okr & tiny, axis=(1, 2))
        o_lo = red_min(o_c, inf)
        o_hi = red_max(o_c, -inf)
        bump = jnp.where(
            tiny_any,
            1e-4 * (1.0 + jnp.maximum(jnp.abs(o_lo), jnp.abs(o_hi))),
            0.0,
        )
        o_los.append(o_lo - bump)
        o_his.append(o_hi + bump)
        i_los.append(jnp.where(tiny_any, -BIGF, red_min(i_c, inf)))
        i_his.append(jnp.where(tiny_any, BIGF, red_max(i_c, -inf)))
    m_lo = red_min(mint, inf)
    t0 = jnp.minimum(red_max(maxt, -inf), BIGF)

    # direction-cone coherence: mean direction per packet, then the
    # minimum cosine of any live ray against it (immune to the axis
    # sign-straddles every centered camera tile has)
    n_live = jnp.maximum(
        jnp.sum(okr.astype(jnp.float32), axis=(1, 2)), 1.0
    )
    dn = 1.0 / jnp.sqrt(
        jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30)
    )
    mx = jnp.sum(jnp.where(okr, dx * dn, 0.0), axis=(1, 2)) / n_live
    my = jnp.sum(jnp.where(okr, dy * dn, 0.0), axis=(1, 2)) / n_live
    mz = jnp.sum(jnp.where(okr, dz * dn, 0.0), axis=(1, 2)) / n_live
    mnorm = jnp.sqrt(jnp.maximum(mx * mx + my * my + mz * mz, 1e-30))
    mx, my, mz = mx / mnorm, my / mnorm, mz / mnorm
    cosd = (
        dx * dn * mx[:, None, None]
        + dy * dn * my[:, None, None]
        + dz * dn * mz[:, None, None]
    )
    cmin = red_min(cosd, inf)
    o_diag = jnp.stack(
        [hi - lo for lo, hi in zip(o_los, o_his)], axis=1
    )
    small_org = jnp.max(o_diag, axis=1) <= 0.25 * scene_diag
    coh = ((cmin >= 0.966) & small_org).astype(jnp.float32)

    zero = jnp.zeros_like(m_lo)
    return jnp.stack(
        o_los + o_his + i_los + i_his + [m_lo, t0, coh, zero], axis=1
    )


def traverse_bvh8(
    scene: BVH8Scene,
    rays: Rays,
    options: BVHTraceOptions = BVHTraceOptions(),
    skip_prim_id=None,
    sub: int = DEF_SUB,
    vmem_mb: int = 116,
    occlusion: bool = False,
    exact_mode: str = "auto",
    scene_space: str = "auto",
    dual_pop: bool = True,
    pop_n: int | None = None,
    frustum: str | bool = "auto",
    frustum_pop_n: int = 2,
    t_sync_every: int = 2,
    lq_cap: int = 1,
    intersector: str = "watertight",
    refit_inkernel: bool = False,
    packet_roots=None,
    specialize: tuple | None = None,
    interleave: int = 1,
    node_split: bool = False,
    leaf_split: bool = False,
    debug_counts: bool = False,
    interpret: bool = False,
    _flag_zero_edges: bool = False,
    _stack_slots: int | None = None,
    _oracle_t=None,
) -> Hits:
    """Trace rays against a VMEM-resident BVH8 scene (fp32).

    ``occlusion=True`` runs the any-hit mode (Embree's rtcOccluded, the
    right engine for shadow/AO rays): each ray stops traversing at its
    first accepted hit and the packet terminates once every ray is
    occluded or exhausted. The returned ``Hits.hit``/``prim_id``/u/v/t
    identify *an* intersection (t is that hit's distance, not necessarily
    the closest — the reference's any-hit contract). Occlusion mode
    assumes shadow-ray windows (min_t >= 0).

    Rays MUST arrive in a spatially coherent order — consecutive groups
    of ``sub*128`` rays form one packet sharing traversal control flow
    (use ``tile_image_rays`` for camera rays). Fully incoherent batches
    make every packet visit the union of all its rays' paths — runtimes
    blow up by orders of magnitude (long enough to trip the TPU watchdog);
    route incoherent rays through traverse.wavefront instead.
    """
    prim_range = (
        None
        if options.prim_ids_range == (0, 0x7FFFFFFF)
        else (int(options.prim_ids_range[0]), int(options.prim_ids_range[1]))
    )
    # exact_mode: how exact_edge_fallback=True is realized.
    #   "single"  — Dekker recompute inline on every leaf test (simple,
    #               ~17% slower leaf phase);
    #   "twopass" — fast pass that flags zero-edge rays, then a rare
    #               in-kernel whole-packet retrace with exact edges
    #               (bit-identical results, no host round trip);
    #   "auto"    — twopass for plain closest-hit traces, single when a
    #               mode needing the one-pass carry layout is active.
    if exact_mode not in ("auto", "single", "twopass"):
        raise ValueError(f"unknown exact_mode {exact_mode!r}")
    if intersector not in ("watertight", "woop"):
        raise ValueError(f"unknown intersector {intersector!r}")
    exact_edge = options.exact_edge_fallback
    if intersector == "woop":
        # turbo mode: unit-triangle transforms have no U/V/W edge
        # functions — the Dekker exact-edge machinery does not apply
        if _flag_zero_edges:
            raise ValueError("flag_zero_edges requires the watertight "
                             "intersector")
        if scene.leafs_woop is None:
            raise ValueError(
                "intersector='woop' needs the Woop leaf table: build it "
                "with build.bvh8.build_woop_leafs and attach via "
                "scene._replace(leafs_woop=...)"
            )
        if scene.max_leaf > 9:
            raise ValueError("woop rows hold <= 9 triangles; rebuild "
                             "with max_leaf_primitives<=9")
        exact_edge = False
    # refit_inkernel: woop traversal + end-of-kernel watertight replay of
    # every drained raw leaf row, overwriting (t, u, v) for each ray's
    # prim-id-matched winner (the in-kernel form of refit_hits_watertight,
    # VERDICT r3 #1). Records become watertight-exact for the woop-chosen
    # prim; prim SELECTION can still differ from the watertight engine on
    # edge-crossing rays. Closest-hit only.
    refit_exact = False
    if refit_inkernel:
        if intersector != "woop":
            raise ValueError("refit_inkernel pairs with intersector='woop'")
        if occlusion or debug_counts or _flag_zero_edges:
            raise ValueError("refit_inkernel is closest-hit only")
        refit_exact = options.exact_edge_fallback
    # specialize: (kz_static, shared_origin[, uniform_sign]) whole-batch
    # specialization
    # (see detect_specialization). kz_static collapses the watertight
    # comp() selects to static lanes; shared_origin scalarizes the
    # vertex/bound-minus-origin terms. Both are bit-exact rewrites of
    # the generic kernel — records are unchanged (the caller is
    # responsible for the batch actually satisfying the claim; use
    # detect_specialization to check on device).
    kz_static = None
    shared_origin = False
    uniform_sign = False
    if specialize is not None:
        (kz_static, shared_origin, uniform_sign) = (
            tuple(specialize) + (False,))[:3]
        if kz_static not in (None, 0, 1, 2):
            raise ValueError(f"kz_static must be None/0/1/2: {kz_static}")
        if intersector == "woop" or (
            kz_static is not None and options.cull_back_face
        ):
            # woop has no shear axis; under back-face culling the
            # reference's winding swap changes accept decisions, so the
            # swap-free static path is only valid without culling
            kz_static = None
    inkernel_exact = (
        exact_edge
        and exact_mode in ("auto", "twopass")
        and not (occlusion or debug_counts or _flag_zero_edges)
    )
    # scene_space: where the BVH8 tables live.
    #   "vmem"      — whole scene VMEM-resident (fastest, <= ~1M tris)
    #   "hbm_leafs" — nodes in VMEM, leaf rows streamed from HBM per
    #                 drain (pipelined async copies)
    #   "hbm"       — both tables in HBM (10M+ tri scenes)
    #   "auto"      — pick by table sizes against the VMEM budget
    if scene_space == "auto":
        node_mb = scene.nodes.size * 4 / 1e6
        leaf_mb = scene.leafs.size * 4 / 1e6
        budget = vmem_mb * 0.92  # leave room for ray tiles/outputs
        if node_mb + leaf_mb <= budget:
            scene_space = "vmem"
        elif node_mb <= budget:
            scene_space = "hbm_leafs"
        else:
            scene_space = "hbm"
    if scene_space not in ("vmem", "hbm_leafs", "hbm"):
        raise ValueError(f"unknown scene_space {scene_space!r}")
    hbm_nodes = scene_space == "hbm"
    hbm_leafs = scene_space in ("hbm", "hbm_leafs")
    width = getattr(scene, "width", 8)
    if width == 16:
        # 16-wide nodes: 32 mask bits at pop_n=2 is the int32 budget;
        # the split-table probe only implements the 8-wide row walk.
        # frustum here takes the LANE-PARALLEL node phase
        # (node_step_frustum16): all 16 children tested in ~30 (1, 128)
        # VPU ops per pop instead of ~17 ops x 32 children on
        # (sub, 128) tiles — the headline engine for coherent batches.
        node_split = False
    if interleave > 1 and (
        hbm_nodes or hbm_leafs or refit_inkernel or debug_counts
        or _flag_zero_edges or node_split or leaf_split
        or packet_roots is not None or _oracle_t is not None
        or frustum not in ("auto", False)
    ):
        # the K-way body covers the benchmark-class configs only
        warnings.warn("interleave>1 supports only the VMEM-resident "
                      "per-ray-vote engine; falling back to interleave=1")
        interleave = 1
    bs = rays.batch_shape
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[len(bs):]), rays
    )
    R = flat.org.shape[0]
    packet = sub * LANES
    n_packets = -(-R // packet)
    if interleave > 1:
        # round the packet count to a multiple of K (tail packets pad
        # with dead rays and finish their lock-step group in one step)
        n_packets = -(-n_packets // interleave) * interleave
    pad = n_packets * packet - R

    def prep(x, fill):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(n_packets, sub, LANES)

    ox = prep(flat.org[:, 0], 0.0)
    oy = prep(flat.org[:, 1], 0.0)
    oz = prep(flat.org[:, 2], 0.0)
    dx = prep(flat.dir[:, 0], 1.0)
    dy = prep(flat.dir[:, 1], 1.0)
    dz = prep(flat.dir[:, 2], 1.0)
    mint = prep(flat.min_t, 1.0)
    maxt = prep(flat.max_t, 0.0)  # padding terminated: max_t < min_t

    use_skip = skip_prim_id is not None
    static_skip = isinstance(options.skip_prim_id, int) and (
        options.skip_prim_id != INVALID_PRIM_ID
    )
    if _oracle_t is not None:
        # decomposition instrument (see _kernel_body oracle_t): the
        # per-ray final-t array rides the skip tile as raw bits
        if use_skip or static_skip:
            raise ValueError("_oracle_t is mutually exclusive with "
                             "skip_prim_id")
        skip = prep(
            jax.lax.bitcast_convert_type(
                jnp.asarray(_oracle_t, jnp.float32).reshape(-1), jnp.int32
            ),
            0,
        )
    elif use_skip:
        skip = prep(
            jnp.asarray(skip_prim_id).reshape(-1).astype(jnp.int32),
            -1,
        )
    elif static_skip:
        use_skip = True
        skip = jnp.full((n_packets, sub, LANES), np.int32(options.skip_prim_id))
    else:
        skip = jnp.zeros((n_packets, sub, LANES), jnp.int32)

    if pop_n is None:
        pop_n = 2 if dual_pop else 1
    unclamp = bool(os.environ.get("NANORT_EXPERIMENTAL_UNCLAMP"))
    if pop_n > 2 and not unclamp:
        # 3/4-way pop kernels die in the TPU backend with an INTERNAL
        # fault on large scenes (isolated on v5e, 2026-08: 100K-tri
        # scenes run pop_n=3/4 fine — and correct — at any stack size;
        # the SAME kernel on a 1M-tri scene faults regardless of SMEM
        # stack slots 208..1024, watertight or woop, so it is neither a
        # stack overflow nor allocation size — likely a backend limit
        # tied to node-table size x in-flight fetches; mechanism probe:
        # tools/experiments/v5e_popn_fault.md). A fault takes the TPU
        # worker down for ~2 min, so this raises instead of clamping
        # (VERDICT r4 #8); 2 is also the measured optimum at benchmark
        # scale, and results are identical at any pop_n (pure perf
        # knob). NANORT_EXPERIMENTAL_UNCLAMP=1 bypasses for backend
        # debugging on expendable workers.
        raise ValueError(
            "pop_n > 2 faults the v5e TPU worker on large (~1M-tri) "
            "scenes (~2 min recovery; see "
            "tools/experiments/v5e_popn_fault.md). Use pop_n<=2 (the "
            "measured optimum — records are identical at any pop_n), "
            "or set NANORT_EXPERIMENTAL_UNCLAMP=1 to probe the fault "
            "on an expendable worker."
        )
    if lq_cap > 2 and not unclamp and not hbm_leafs:
        # The r2 "lq_cap > 2 faults" in HBM modes were an undersized DMA
        # scratch: one node_step can queue lq_cap-1 + width*pop_n leaf
        # rows but the buffer/semaphore arrays held 16 — queue indices
        # past 15 were OOB DMA targets (r3 fix: exact worst-case sizing;
        # lq_cap 4/8/16 verified fault-free on the 10M HBM scene, perf
        # flat — the 10M path is leaf-compute bound, not DMA bound).
        # VMEM-mode lq_cap > 2 raises pending its own fault probe
        # (tools/experiments/v5e_popn_fault.md): a worker fault costs
        # ~2 min, too sharp for a silent knob.
        raise ValueError(
            "lq_cap > 2 is unverified for VMEM-resident scenes and the "
            "fault class it risks takes the TPU worker down for ~2 min "
            "(tools/experiments/v5e_popn_fault.md). Use lq_cap<=2 "
            "(lq_cap=1 is the measured optimum), or set "
            "NANORT_EXPERIMENTAL_UNCLAMP=1 on an expendable worker."
        )
    # frustum: replace the per-ray node-phase slab vote with a
    # conservative per-packet interval test run on the scalar unit (the
    # per-ray vote is OR-reduced to one bit anyway). Closest-hit only:
    # occlusion's early-exit relies on occluded rays leaving the vote.
    # Measured on the 1M-tri bench it LOSES to the dual-pop vector vote
    # (123 vs 129 Mrays/s watertight, 138 vs 160 woop): the scalar-unit
    # interval tests serialize against the VPU instead of overlapping
    # it, so "auto" resolves to off; the engine stays available (exact —
    # zero hit diffs measured) for sparse/teaser scenes where the
    # conservative cull pays.
    if frustum == "auto":
        frustum = False
    if frustum:
        # scene diagonal from the root row's child boxes (empty slots
        # carry inverted huge boxes; min/max over real children win)
        nd = jnp.asarray(scene.nodes)[0, :48].reshape(8, 6)
        real = nd[:, 0] <= nd[:, 3]
        s_lo = jnp.min(jnp.where(real[:, None], nd[:, 0:3], np.inf), axis=0)
        s_hi = jnp.max(jnp.where(real[:, None], nd[:, 3:6], -np.inf), axis=0)
        scene_diag = jnp.max(s_hi - s_lo)
        pkt_arr = _frustum_bounds(
            ox, oy, oz, dx, dy, dz, mint, maxt, scene_diag
        )
    else:
        pkt_arr = jnp.zeros((n_packets, 16), jnp.float32)
    use_roots = packet_roots is not None
    if use_roots:
        roots_f = jnp.asarray(packet_roots, jnp.float32).reshape(
            n_packets, 1
        )
    else:
        roots_f = jnp.zeros((n_packets, 1), jnp.float32)
    # one 128-lane SMEM row per packet: [0:14] frustum bounds, [16] root,
    # [20:23] shared origin (when the shared_origin specialization is on)
    if shared_origin:
        org_row = jnp.broadcast_to(
            flat.org[0].astype(jnp.float32)[None, :], (n_packets, 3)
        )
    else:
        org_row = jnp.zeros((n_packets, 3), jnp.float32)
    if uniform_sign:
        # per-packet direction-sign flags over LIVE rays (lanes 23-25);
        # dead (max_t <= min_t, incl. tail padding) rays are excluded —
        # their slab vote is empty-interval false under either sign
        live = maxt > mint
        sgn = lambda dc: jnp.max(
            jnp.where(live & (dc < 0), 1.0, 0.0), axis=(1, 2)
        )[:, None]
        sign_row = jnp.concatenate([sgn(dx), sgn(dy), sgn(dz)], axis=1)
    else:
        sign_row = jnp.zeros((n_packets, 3), jnp.float32)
    pkt_arr = jnp.concatenate(
        [pkt_arr, roots_f, jnp.zeros((n_packets, 3), jnp.float32),
         org_row, sign_row, jnp.zeros((n_packets, LANES - 26), jnp.float32)],
        axis=1,
    ).reshape(n_packets, 1, LANES)
    nodes_arr = jnp.asarray(scene.nodes)
    leafs_arr = jnp.asarray(
        scene.leafs_woop if intersector == "woop" else scene.leafs
    )
    tables = []
    n_node_lo = 0
    if node_split and not hbm_nodes and nodes_arr.shape[0] >= 2:
        n_node_lo = (nodes_arr.shape[0] + 1) // 2
        tables += [nodes_arr[:n_node_lo], nodes_arr[n_node_lo:]]
    else:
        tables += [nodes_arr]
    n_leaf_lo = 0
    if leaf_split and not hbm_leafs and leafs_arr.shape[0] >= 2:
        n_leaf_lo = (leafs_arr.shape[0] + 1) // 2
        tables += [leafs_arr[:n_leaf_lo], leafs_arr[n_leaf_lo:]]
    else:
        tables += [leafs_arr]
    if refit_inkernel:
        tables += [jnp.asarray(scene.leafs)]  # raw verts, HBM-streamed
    kern = _make_kernel(
        n_packets,
        sub,
        options.cull_back_face,
        exact_edge,
        use_skip,
        # worst case ~7 live siblings per level per in-flight DFS line;
        # pop_n>1 interleaves up to pop_n lines (quad-pop at the old
        # 16*depth bound overflowed the SMEM stack and faulted the chip)
        _stack_slots
        if _stack_slots is not None
        else max(64, width * scene.depth
                 * max(2, pop_n, frustum_pop_n if frustum else 0) + 64),
        vmem_mb,
        scene.max_leaf,
        pop_n,
        occlusion,
        prim_range,
        inkernel_exact,
        hbm_nodes,
        hbm_leafs,
        use_roots,
        bool(frustum),
        t_sync_every,
        lq_cap,
        intersector,
        debug_counts,
        _flag_zero_edges,
        kz_static,
        shared_origin,
        uniform_sign,
        n_node_lo,
        n_leaf_lo,
        width,
        frustum_pop_n,
        refit_inkernel,
        refit_exact,
        oracle_t=_oracle_t is not None,
        interleave=interleave,
        # NOTE: interpret=True nominally lets CPU cover this kernel, but
        # the Pallas interpreter is impractically slow on it (a 256-ray
        # toy config exceeds 9 min); TPU verification stays with
        # tools/verify_pallas.py + bench.py
        interpret=interpret,
    )
    outs = kern(
        *tables,
        ox, oy, oz, dx, dy, dz, mint, maxt, skip, pkt_arr,
    )
    t, u, v, pid = outs[:4]

    unshape = lambda x: x.reshape(-1)[:R].reshape(bs)
    t = unshape(t)
    u = unshape(u)
    v = unshape(v)
    pid = unshape(pid).astype(jnp.uint32)
    maxt_o = rays.max_t
    if debug_counts:
        # u/v are the raw per-packet (node pops, leaf drains) counters
        return Hits(t=t, u=u, v=v, prim_id=pid)
    if occlusion:
        hit = t <= jnp.float32(-1.0)  # encoded as -(tt+1) in-kernel
        t = jnp.where(hit, -t - 1.0, maxt_o)
    else:
        hit = t < maxt_o  # in-kernel-sanitized rays report t=+inf
    zero = jnp.zeros((), jnp.float32)
    hits = Hits(
        t=t,
        u=jnp.where(hit, u, zero),
        v=jnp.where(hit, v, zero),
        prim_id=jnp.where(hit, pid, jnp.uint32(INVALID_PRIM_ID)),
    )
    if _flag_zero_edges:
        return hits, unshape(outs[4])
    return hits


def detect_specialization(rays: Rays, sub: int | None = None) -> tuple | None:
    """Check (on device, a few scalar readbacks) whether a concrete ray
    batch qualifies for the bit-exact kernel specializations:

    * ``kz_static``: every live ray shares the same watertight shear axis
      kz = argmax |d| (reference tie chain, nanort.h:1166-1176). True for
      any camera whose field of view keeps |tan| < 1 on both image axes —
      e.g. the 60-degree bench pinhole.
    * ``shared_origin``: every live ray has the exact same origin
      (pinhole primaries).
    * ``uniform_sign`` (checked only when ``sub`` — the packet size the
      batch will traverse with — is given): every live ray WITHIN each
      ``sub*128``-ray packet shares its direction octant, so the slab
      bound selection runs on the scalar unit (6 fewer vector selects
      per child test). True for pinhole primaries in power-of-two pixel
      tiles: the sign-flip lines land on tile boundaries.

    Degenerate rays (the kernel sanitizes them into guaranteed misses)
    and dead rays (max_t <= min_t) are excluded from the sign check.
    Returns ``(kz | None, shared: bool[, uniform_sign: bool])`` to pass
    as ``traverse_bvh8(..., specialize=...)``, or None when no property
    holds. Call ONCE per batch outside any timing loop: each check is a
    full device reduction over the batch.
    """
    org = jnp.asarray(rays.org, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(rays.dir, jnp.float32).reshape(-1, 3)
    BIG = jnp.float32(3.0e38)
    ok = (
        jnp.all(jnp.abs(org) < BIG, axis=1)
        & jnp.all(jnp.abs(d) < BIG, axis=1)
        & (jnp.sum(jnp.abs(d), axis=1) > 0)
    )
    first = jnp.argmax(ok)
    shared = jnp.all(
        jnp.where(ok[:, None], org == org[first][None, :], True)
    )
    ad = jnp.abs(d)
    kz = jnp.where(ad[:, 1] > ad[:, 0], 1, 0)
    amax = jnp.where(ad[:, 1] > ad[:, 0], ad[:, 1], ad[:, 0])
    kz = jnp.where(ad[:, 2] > amax, 2, kz)
    kz_uniform = jnp.all(jnp.where(ok, kz == kz[first], True))
    any_ok = bool(jnp.any(ok))
    if not any_ok:
        return None
    kz_val = int(kz[first]) if bool(kz_uniform) else None
    shared_b = bool(shared)
    if sub is None:
        if kz_val is None and not shared_b:
            return None
        return (kz_val, shared_b)
    # per-packet sign uniformity over live rays, with the same packet
    # partition traverse_bvh8 will use (flat order, tail-padded)
    packet = sub * LANES
    R = d.shape[0]
    n_pk = -(-R // packet)
    pad = n_pk * packet - R
    live = ok & (
        jnp.asarray(rays.max_t).reshape(-1)
        > jnp.asarray(rays.min_t).reshape(-1)
    )
    live_p = jnp.pad(live, (0, pad)).reshape(n_pk, packet)
    usign = True
    for a in range(3):
        neg = jnp.pad(d[:, a] < 0, (0, pad)).reshape(n_pk, packet)
        any_n = jnp.any(neg & live_p, axis=1)
        all_n = ~jnp.any(~neg & live_p, axis=1)
        usign = usign & bool(jnp.all(any_n == all_n))
    if kz_val is None and not shared_b and not usign:
        return None
    return (kz_val, shared_b, bool(usign))


def traverse_bvh8_exact(
    scene: BVH8Scene,
    rays: Rays,
    options: BVHTraceOptions = BVHTraceOptions(),
    skip_prim_id=None,
    sub: int = DEF_SUB,
    vmem_mb: int = 116,
) -> Hits:
    """Two-pass exact-edge traversal, same results as
    ``exact_edge_fallback=True`` at close to fallback-off speed.

    The main pass runs with the Dekker double-word edge recompute OFF
    (~17% faster leaf tests) while flagging every ray that tested an
    in-range triangle with a zero edge function — exactly the rays whose
    hit record COULD differ under the exact recompute. Only flagged rays
    (typically a vanishing fraction) retrace through the exact kernel
    and overwrite their records. Requires host sync between passes, so
    call it OUTSIDE jit (bench/driver loops), not from jitted renderers.
    Matches nanort.h:1093-1107 semantics end to end.

    Measured on the tunneled v5e (8192^2, 1M tris): pass 1 runs 11%
    faster than the single-pass exact kernel, but the gather/merge
    dispatch overhead through the tunnel currently outweighs it
    (89.5 vs 112.7 Mrays/s end to end) — prefer plain traverse_bvh8
    there; revisit on directly-attached hardware.
    """
    import dataclasses

    opt_fast = dataclasses.replace(options, exact_edge_fallback=False)
    hits, zflag = traverse_bvh8(
        scene, rays, opt_fast, skip_prim_id, sub, vmem_mb,
        _flag_zero_edges=True,
    )
    # reduce to PER-PACKET flags on device: per-ray flags are 4 bytes/ray
    # (a 268 MB readback for a 67M-ray megabatch — measured 8x slower than
    # the traversal itself through the tunneled backend); packet flags are
    # n_packets ints, and retracing whole packets keeps pass 2 coherent
    packet = sub * LANES
    zf = zflag.reshape(-1)
    R = zf.shape[0]
    n_packets = -(-R // packet)
    zf = jnp.pad(zf, (0, n_packets * packet - R))
    pkt_flag = np.asarray(jnp.max(zf.reshape(n_packets, packet), axis=1))
    pidx = np.nonzero(pkt_flag)[0]
    if pidx.size == 0:
        return hits
    opt_exact = dataclasses.replace(options, exact_edge_fallback=True)
    if pidx.size > max(1, n_packets // 8):
        # degenerate scene (e.g. axis-aligned grids hit edge-on): the
        # flagged set is too large to retrace cheaply — run full exact
        return traverse_bvh8(scene, rays, opt_exact, skip_prim_id, sub,
                             vmem_mb)
    idx = jnp.asarray(
        (pidx[:, None] * packet + np.arange(packet)[None, :]).reshape(-1)
    )
    idx = jnp.minimum(idx, R - 1)  # tail packet clamps into range
    bs = rays.batch_shape
    take = lambda x: jnp.take(
        x.reshape((-1,) + x.shape[len(bs):]), idx, axis=0
    )
    sub_rays = jax.tree_util.tree_map(take, rays)
    sub_skip = None
    if skip_prim_id is not None:
        sub_skip = jnp.take(jnp.asarray(skip_prim_id).reshape(-1), idx)
    fixed = traverse_bvh8(
        scene, sub_rays, opt_exact, sub_skip, sub, vmem_mb
    )
    merge = lambda full, part: full.reshape(
        (-1,) + full.shape[len(bs):]
    ).at[idx].set(part).reshape(full.shape)
    return jax.tree_util.tree_map(merge, hits, fixed)


def traverse_bvh8_exact_fused(
    scene: BVH8Scene,
    rays: Rays,
    options: BVHTraceOptions = BVHTraceOptions(),
    skip_prim_id=None,
    sub: int = DEF_SUB,
    vmem_mb: int = 116,
    specialize=None,
    fix_rows: int = 2048,
    fix_sub: int = 16,
    pop_n: int = 2,
    frustum="auto",
) -> tuple[Hits, jax.Array]:
    """Exact-edge twopass with the retrace OUT of the Pallas kernel —
    one fully-jittable XLA graph, no host round trip.

    Why: the shipped ``exact_mode="twopass"`` carries the retrace as a
    SECOND copy of the traversal loop inside the kernel, and the mere
    presence of that body costs ~3% (VREG pressure/scheduling: 146.2 vs
    150.8 Mrays/s flag-only, tools/logs/exp_r5_exact.json). Here pass 1
    runs the flag-only kernel (exact recompute off, per-ray zero-edge
    flags on), then an in-graph fixed-capacity gather retraces ONLY the
    flagged 128-ray rows (typically ~300 of 524K on the headline batch)
    through the exact-``single`` kernel and scatters their records back.
    Semantics match nanort.h:1093-1107 end to end, like the in-kernel
    twopass; equal-t ties can resolve differently (packet regrouping
    changes traversal order — legal per the repo-wide tie contract).

    Returns ``(hits, overflow)`` where ``overflow`` is a device scalar
    bool: True iff more than ``fix_rows`` rows flagged, i.e. the fixup
    capacity was exceeded and flagged rays beyond it kept their fast-
    pass records. Callers wanting a hard guarantee check it once per
    workload shape (bench.py does) and re-run with a bigger ``fix_rows``
    or ``exact_mode="twopass"``; typical coherent batches flag ~0.06%
    of rows, so the default capacity has ~7x headroom.
    """
    import dataclasses

    if not options.exact_edge_fallback:
        raise ValueError("exact_fused requires exact_edge_fallback=True")
    opt_fast = dataclasses.replace(options, exact_edge_fallback=False)
    hits, zflag = traverse_bvh8(
        scene, rays, opt_fast, skip_prim_id, sub, vmem_mb,
        specialize=specialize, pop_n=pop_n, frustum=frustum,
        _flag_zero_edges=True,
    )
    zf = zflag.reshape(-1).astype(jnp.int32)
    R = zf.shape[0]
    n_rows = -(-R // LANES)
    zf = jnp.pad(zf, (0, n_rows * LANES - R))
    row_flag = jnp.max(zf.reshape(n_rows, LANES), axis=1)
    fix_rows = max(fix_sub, -(-fix_rows // fix_sub) * fix_sub)
    n_flagged = jnp.sum((row_flag > 0).astype(jnp.int32))
    overflow = n_flagged > fix_rows
    (idx_rows,) = jnp.nonzero(row_flag, size=fix_rows, fill_value=0)
    ray_idx = (
        idx_rows[:, None] * LANES
        + jnp.arange(LANES, dtype=idx_rows.dtype)[None, :]
    ).reshape(-1)
    ray_idx = jnp.minimum(ray_idx, R - 1)  # padded tail rows clamp

    bs = rays.batch_shape
    take = lambda x: jnp.take(
        x.reshape((-1,) + x.shape[len(bs):]), ray_idx, axis=0
    )
    sub_rays = jax.tree_util.tree_map(take, rays)
    sub_skip = skip_prim_id
    if skip_prim_id is not None and not isinstance(skip_prim_id, int):
        sub_skip = jnp.take(
            jnp.asarray(skip_prim_id).reshape(-1), ray_idx
        )
    spec_fix = None
    if specialize is not None:
        # kz/shared-origin survive any subset; uniform_sign is a
        # per-packet octant claim that row regrouping breaks — drop it
        spec_fix = (tuple(specialize) + (False,))[:2]
    fixed = traverse_bvh8(
        scene, sub_rays, options, sub_skip, fix_sub, vmem_mb,
        specialize=spec_fix, exact_mode="single",
    )
    # nonzero() pads with row 0: only scatter rows that really flagged
    # (duplicate indices then all carry row 0's ORIGINAL record — equal
    # values, so scatter order can't matter)
    valid = jnp.repeat(row_flag[idx_rows] > 0, LANES)

    def merge(full, fx):
        flat = full.reshape((-1,) + full.shape[len(bs):])
        keep = jnp.where(valid, fx, jnp.take(flat, ray_idx, axis=0))
        return flat.at[ray_idx].set(keep).reshape(full.shape)

    return jax.tree_util.tree_map(merge, hits, fixed), overflow


def refit_hits_watertight(mesh, rays: Rays, hits: Hits,
                          options: BVHTraceOptions = BVHTraceOptions()
                          ) -> Hits:
    """Recompute each hit's (t, u, v) with the reference watertight
    intersector (nanort.h:993-1229) against the already-selected
    triangle — one triangle per ray, a cheap XLA pass.

    Pairs with ``intersector="woop"``: the turbo kernel picks the prim,
    this pass restores bit-exact watertight records for it, so the only
    remaining deviation from the reference is prim *selection* on
    edge-crossing rays (equal-t ties). If the watertight re-test rejects
    the woop hit (possible only within an ulp of an edge), the woop
    record is kept as-is.
    """
    from ..ops.triangle import _exact_prod_diff

    # everything runs on (X, 128)-shaped component tiles: (N, 3)-vector
    # intermediates and 2-D gather indices provoke XLA-TPU layouts that
    # pad the size-3/size-1 dims to 128 lanes (a 34 GB copy at 67M rays)
    bs = rays.org.shape[:-1]
    R = int(np.prod(bs)) if bs else 1

    def tile1(x, fill):
        x = x.reshape(-1)
        pad = (-R) % LANES
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(-1, LANES)

    untile = lambda x: x.reshape(-1)[:R].reshape(bs)

    hit = tile1(hits.prim_id != jnp.uint32(INVALID_PRIM_ID), False)
    pid = jnp.where(hit, tile1(hits.prim_id, 0).astype(jnp.int32), 0)
    faces = jnp.asarray(mesh.faces)
    verts = jnp.asarray(mesh.vertices)
    # ONE row gather of a packed (n_tris, 16) triangle table: TPU lowers
    # scalar gathers at ~100M idx/s but contiguous small-row gathers an
    # order of magnitude faster (measured 12 scalar takes ~7s vs one
    # 16-wide row take ~0.9s at 67M rays)
    tri9 = verts[faces].reshape(-1, 9).astype(jnp.float32)
    tri16 = jnp.pad(tri9, ((0, 0), (0, 7)))
    g = jnp.take(tri16, pid, axis=0)
    (p0x, p0y, p0z), (p1x, p1y, p1z), (p2x, p2y, p2z) = (
        tuple(g[..., 3 * k + c] for c in range(3)) for k in range(3)
    )
    ox = tile1(rays.org[..., 0], 0.0)
    oy = tile1(rays.org[..., 1], 0.0)
    oz = tile1(rays.org[..., 2], 0.0)
    dx = tile1(rays.dir[..., 0], 1.0)
    dy = tile1(rays.dir[..., 1], 1.0)
    dz = tile1(rays.dir[..., 2], 1.0)
    min_t = tile1(rays.min_t, 1.0)
    max_t = tile1(rays.max_t, 0.0)

    # shear coefficients, same tie-break chain as ops.triangle.ray_coeffs
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    kz = jnp.where(ady > adx, 1, 0)
    amax = jnp.where(ady > adx, ady, adx)
    kz = jnp.where(adz > amax, 2, kz).astype(jnp.int32)
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3

    def comp(vx, vy, vz, k):
        return jnp.where(k == 0, vx, jnp.where(k == 1, vy, vz))

    dkz = comp(dx, dy, dz, kz)
    negk = dkz < 0
    kx, ky = jnp.where(negk, ky, kx), jnp.where(negk, kx, ky)
    sx = comp(dx, dy, dz, kx) / dkz
    sy = comp(dx, dy, dz, ky) / dkz
    sz = 1.0 / dkz

    ax_, ay_, az_ = p0x - ox, p0y - oy, p0z - oz
    bx_, by_, bz_ = p1x - ox, p1y - oy, p1z - oz
    cx_, cy_, cz_ = p2x - ox, p2y - oy, p2z - oz
    Az = comp(ax_, ay_, az_, kz)
    Bz = comp(bx_, by_, bz_, kz)
    Cz = comp(cx_, cy_, cz_, kz)
    Ax = comp(ax_, ay_, az_, kx) - sx * Az
    Ay = comp(ax_, ay_, az_, ky) - sy * Az
    Bx = comp(bx_, by_, bz_, kx) - sx * Bz
    By = comp(bx_, by_, bz_, ky) - sy * Bz
    Cx = comp(cx_, cy_, cz_, kx) - sx * Cz
    Cy = comp(cx_, cy_, cz_, ky) - sy * Cz

    U = Cx * By - Cy * Bx
    V = Ax * Cy - Ay * Cx
    W = Bx * Ay - By * Ax
    if options.exact_edge_fallback:
        zmask = (U == 0.0) | (V == 0.0) | (W == 0.0)
        U = jnp.where(zmask, _exact_prod_diff(Cx, By, Cy, Bx), U)
        V = jnp.where(zmask, _exact_prod_diff(Ax, Cy, Ay, Cx), V)
        W = jnp.where(zmask, _exact_prod_diff(Bx, Ay, By, Ax), W)
    any_neg = (U < 0.0) | (V < 0.0) | (W < 0.0)
    any_pos = (U > 0.0) | (V > 0.0) | (W > 0.0)
    if options.cull_back_face:
        edge_ok = ~any_neg
    else:
        edge_ok = ~(any_neg & any_pos)
    det = U + V + W
    det_ok = det != 0.0
    rcp = 1.0 / jnp.where(det_ok, det, 1.0)
    tt = (U * (sz * Az) + V * (sz * Bz) + W * (sz * Cz)) * rcp
    valid = hit & edge_ok & det_ok & (tt <= max_t) & (tt >= min_t)

    t_new = untile(jnp.where(valid, tt, tile1(hits.t, 0.0)))
    u_new = untile(jnp.where(valid, V * rcp, tile1(hits.u, 0.0)))
    v_new = untile(jnp.where(valid, W * rcp, tile1(hits.v, 0.0)))
    return Hits(t=t_new, u=u_new, v=v_new, prim_id=hits.prim_id)


def tile_image_rays(rays: Rays, tile_h: int = 32, tile_w: int = 32):
    """Reorder (H, W)-shaped image rays into square pixel tiles so each
    packet covers a compact frustum (a raw row-major order would hand each
    packet a 1024-pixel-wide strip, whose union footprint touches far more
    BVH leaves). Returns (flat_rays, untile) where ``untile`` restores
    image shape for any (H*W,)-leading result pytree."""
    H, W = rays.org.shape[:2]
    assert H % tile_h == 0 and W % tile_w == 0, (H, W, tile_h, tile_w)

    def fwd(x):
        x = x.reshape(H // tile_h, tile_h, W // tile_w, tile_w, *x.shape[2:])
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape(H * W, *x.shape[4:])

    def untile(tree):
        def inv(x):
            x = x.reshape(H // tile_h, W // tile_w, tile_h, tile_w, *x.shape[1:])
            x = jnp.swapaxes(x, 1, 2)
            return x.reshape(H, W, *x.shape[4:])

        return jax.tree_util.tree_map(inv, tree)

    return jax.tree_util.tree_map(fwd, rays), untile
