"""Fully device-side scene build: LBVH topology -> BVH8/16 packet tables
without a single host-side pass over the primitives.

The reference builds on the CPU (nanort.h:1997-2073, a thread pool over
subtrees) and its "~10M triangles efficiently" claim (README.md:19) is
bounded by host memory bandwidth. The TPU-native answer keeps the whole
pipeline on the accelerator: Morton codes + Karras'12 topology (reused
from build/lbvh.py), then a data-parallel wide collapse that emits the
exact packet-kernel table format of build/bvh8.py — so `traverse_bvh8`
consumes the result unchanged. The host never materializes the tree:
only two scalar counts are read back between the two jitted phases
(XLA needs static output shapes; the tables are bucket-padded to
powers of two so each scene size compiles at most once per bucket).

Wide collapse, data-parallel formulation: instead of the host builder's
greedy surface-area cuts (bvh8.py:cut8_batch, inherently sequential per
node), wide nodes are the kept binary nodes at depth % K == 0
(K = log2(width)); each wide node's children are the K-level frontier
of its binary subtree — ≤ 2^K = width children by construction. Every
kept binary node finds its owning wide node with ≤ K-1 pointer jumps,
every collapsed binary leaf attaches to its ancestor's wide node, and
slot order within a node is a (parent, centroid-along-axis) device
sort, preserving the packet kernel's near-first ordered traversal.

Tree quality is LBVH-grade (~10-30% more node visits than binned SAH —
the known tradeoff); use the native SAH builder + host collapse when
build time is amortized, and this path when it isn't (huge scenes,
generated-on-device geometry, interactive rebuilds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bvh8 import BVH8Scene, EMPTY_BIG, MAX_LEAF_TRIS
from .lbvh import MAX_DEPTH, _karras_topology, morton_codes
from ..ops.triangle import _exact_prod_diff

_I32MAX = np.int32(2**31 - 1)

# capacity guard for the auto (None) quality extras of
# collapse_lbvh_device: leaf-merge + preorder are on up to this prim
# count and off above it. Measured green with extras at 1M
# (tools/logs/exp_r5_devorder.log); 10M with extras RESOURCE_EXHAUSTEDs
# on an otherwise-quiet v5e (tools/logs/matrix_r5_tenm4.log) — the
# merge's sorted 2n-row leaf-bank copies and the preorder relabel
# scatters are the added transients. 4M sits between the measured
# points with ~2.5x the 1M working set.
_EXTRAS_MAX_N = 4_000_000


def _next_pow2(x: int) -> int:
    return 1 << max(0, (int(x) - 1).bit_length())


def _make_range_minmax(sorted_lo, sorted_hi, n: int):
    """Exact (lo, hi) bbox over any index range of the Morton-sorted
    prim boxes, as O(1) gathers from two-tier sparse min-tables.

    Replaces the O(depth) refit fixpoint (26 full-tree gather rounds at
    10M tris = 14.1 s) and the unrolled leaf-range scan (5.0 s) with a
    couple of row gathers per query. min/max are associative, so the
    values are bit-identical to the sequential reduction.

    Tier 1 ("small", ranges of length <= B): classic sparse table on the
    full array, levels 0..log2(B), flattened so a per-node level rides
    the gather index. Tier 2 (longer ranges): per-block suffix/prefix
    mins + a sparse table over block mins. hi rides the same tables
    negated (range max == -range-min of -x).
    """
    f32 = jnp.float32
    i32 = jnp.int32
    BIG = jnp.asarray(EMPTY_BIG, f32)
    m = jnp.concatenate([sorted_lo, -sorted_hi], axis=1)  # (n, 6)

    # small tier covers len <= 2*B exactly (len in (B, 2B] uses the two
    # k = LOG_SMALL windows); block tier handles len > 2*B, where a and
    # b are guaranteed to sit in DIFFERENT blocks. Levels live as
    # SEPARATE (n, 6) arrays, NOT one flat (levels*n, 6) concat: the
    # flat table needed a ~1 GB CONTIGUOUS block at 10M tris, which is
    # exactly the allocation a fragmented post-first-build heap cannot
    # serve (the r3 rebuild RESOURCE_EXHAUSTED class). Per-level
    # queries gather each level at its own static window offset and
    # select by k — a few extra cheap row gathers, no flat table.
    LOG_SMALL = 3
    LOG_B = 4
    B = 1 << LOG_B
    n_small_lv = min(LOG_SMALL, max((n - 1).bit_length(), 0)) + 1

    def shift_min(t, s, size):
        out = jnp.full_like(t, BIG)
        if s < size:
            out = out.at[: size - s].set(t[s:])
        return jnp.minimum(t, out)

    levels = [m]
    for k in range(1, n_small_lv):
        levels.append(shift_min(levels[-1], 1 << (k - 1), n))

    nb = -(-n // B)
    pad = nb * B - n
    mp = jnp.concatenate(
        [m, jnp.full((pad, 6), BIG, f32)]).reshape(nb, B, 6)
    pre = jax.lax.associative_scan(jnp.minimum, mp, axis=1)
    suf = jax.lax.associative_scan(jnp.minimum, mp, axis=1, reverse=True)
    pre = pre.reshape(nb * B, 6)
    suf = suf.reshape(nb * B, 6)

    bm = mp.min(axis=1)  # (nb, 6) block mins
    n_block_lv = max((nb - 1).bit_length(), 0) + 1
    blevels = [bm]
    for k in range(1, n_block_lv):
        blevels.append(shift_min(blevels[-1], 1 << (k - 1), nb))
    # the block table stays flat: ~300 MB contiguous at 10M tris (vs
    # the small tier's ~1 GB), and per-level selection here would cost
    # ~2*n_block_lv extra n-sized gathers per query
    tb = jnp.concatenate(blevels, axis=0)  # (n_block_lv * nb, 6)

    def ilog2(x):
        return i32(31) - jax.lax.clz(jnp.maximum(x, 1))

    def query(a, b):
        """Range (lo, hi) over sorted prims [a, b] inclusive; a <= b."""
        size = b - a + 1
        # small tier: len <= B — per-level gathers, selected by k
        k = jnp.minimum(ilog2(size), i32(n_small_lv - 1))
        small = None
        for j in range(n_small_lv):
            bj = jnp.maximum(b - (i32(1) << j) + 1, 0)
            cand = jnp.minimum(
                jnp.take(levels[j], a, axis=0),
                jnp.take(levels[j], bj, axis=0),
            )
            small = cand if small is None else jnp.where(
                (k == j)[:, None], cand, small)
        if n <= B:
            res = small
        else:
            # big tier: block(a) suffix + interior blocks + block(b) prefix
            ba, bb = a >> LOG_B, b >> LOG_B
            edge = jnp.minimum(
                jnp.take(suf, a, axis=0), jnp.take(pre, b, axis=0)
            )
            u, w = ba + 1, bb - 1
            ilen = jnp.maximum(w - u + 1, 0)
            kb = jnp.minimum(ilog2(ilen), i32(n_block_lv - 1))
            offb = kb * i32(nb)
            uc = jnp.clip(u, 0, nb - 1)
            wc = jnp.clip(w - (i32(1) << kb) + 1, 0, nb - 1)
            interior = jnp.minimum(
                jnp.take(tb, offb + uc, axis=0),
                jnp.take(tb, offb + wc, axis=0),
            )
            big = jnp.minimum(
                edge, jnp.where((ilen > 0)[:, None], interior, BIG)
            )
            res = jnp.where((size <= B)[:, None], small, big)
        return res[:, :3], -res[:, 3:]

    return query


@functools.partial(
    jax.jit,
    static_argnames=("n", "max_leaf", "sah_levels", "sah_bins", "sah_stop"),
)
def _phase_a_topo(vertices, faces, n: int, max_leaf: int,
                  sah_levels: int = 0, sah_bins: int = 16,
                  sah_stop: int = 64):
    """Phase A, stage 1: Morton sort, Karras topology, and every node /
    collapsed-leaf bbox via the O(1) range-min tables.

    ``sah_levels > 0`` inserts the reordering binned-SAH top phase
    (build/sah_top.py): the top ``sah_levels`` of the tree follow the
    reference's SAH criterion with real centroid partitioning, Morton
    topology below — the r3-measured fix for the LBVH node-visit tax
    (contiguous-order split tweaks are a measured dead end; see
    lbvh.hybrid_deltas).

    A separate jit from the record stage so the sparse min-tables
    (~1.7 GB of transients at 10M tris) are FREED before the record
    banks and their 30M-row sort materialize — one fused phase A holds
    both working sets at once and exhausts v5e HBM at 10M tris."""
    i32 = jnp.int32
    v0 = jnp.take(vertices, faces[:, 0], axis=0)
    v1 = jnp.take(vertices, faces[:, 1], axis=0)
    v2 = jnp.take(vertices, faces[:, 2], axis=0)
    prim_lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    prim_hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    centers = 0.5 * (prim_lo + prim_hi)
    scene_lo = prim_lo.min(axis=0)
    scene_hi = prim_hi.max(axis=0)

    codes = morton_codes(centers, scene_lo, scene_hi)
    order = jnp.argsort(codes).astype(i32)
    codes = jnp.take(codes, order)
    if sah_levels > 0:
        from .sah_top import sah_hybrid_deltas, sah_top_partition
        from .lbvh import _topology_from_deltas

        perm, rcodes = sah_top_partition(
            jnp.take(centers, order, axis=0),
            jnp.take(prim_lo, order, axis=0),
            jnp.take(prim_hi, order, axis=0),
            n, levels=sah_levels, bins=sah_bins, stop_cap=sah_stop,
        )
        order = jnp.take(order, perm)
        codes = jnp.take(codes, perm)
        D = sah_hybrid_deltas(codes, rcodes, n, sah_levels)
        first, last, split = _topology_from_deltas(D, n)
    else:
        first, last, split = _karras_topology(codes, n)

    r_child = split + 1
    # ---- bboxes: every node (internal or collapsed leaf) covers the
    # contiguous sorted-prim range [first, last], so all boxes are O(1)
    # range-min/max queries — no refit fixpoint over the tree at all ----
    sorted_lo = jnp.take(prim_lo, order, axis=0)
    sorted_hi = jnp.take(prim_hi, order, axis=0)
    range_query = _make_range_minmax(sorted_lo, sorted_hi, n)

    def chunked_query(a, b, chunk=1 << 20):
        """range_query in lax.map chunks: one full-width query gathers
        2 rows per small-tier level + 4 block-tier rows, so its live
        intermediates are ~12x the (m, 6) result — ~7 GB at 10M tris
        when XLA schedules all three node queries greedily (the r4
        first-build RESOURCE_EXHAUSTED). Chunking caps them at
        ~12 * chunk * 24 B ~ 300 MB."""
        m = a.shape[0]
        if m <= chunk:
            return range_query(a, b)
        C = -(-m // chunk)
        pad = C * chunk - m
        ap = jnp.pad(a, (0, pad))
        bp = jnp.pad(b, (0, pad))
        lo, hi = jax.lax.map(
            lambda ab: range_query(ab[0], ab[1]),
            (ap.reshape(C, chunk), bp.reshape(C, chunk)),
        )
        return lo.reshape(-1, 3)[:m], hi.reshape(-1, 3)[:m]

    lf_lo, lf_hi = chunked_query(first, split)
    rf_lo, rf_hi = chunked_query(r_child, last)
    node_lo, node_hi = chunked_query(first, last)
    axis_i = jnp.argmax(node_hi - node_lo, axis=1).astype(i32)
    return (order, first, last, split, scene_lo,
            lf_lo, lf_hi, rf_lo, rf_hi, node_lo, node_hi, axis_i)


@functools.partial(
    jax.jit, static_argnames=("n", "max_leaf", "K", "merge_leaves"),
    donate_argnums=(1, 2, 3, 5, 6, 7, 8, 9, 10, 11),
)
def _phase_a_records(order, first, last, split, scene_lo,
                     lf_lo, lf_hi, rf_lo, rf_hi, node_lo, node_hi,
                     axis_i, n: int, max_leaf: int, K: int,
                     merge_leaves: bool = False):
    """Phase A, stage 2: child records, sorted by (wide parent, slot
    order). Topology/box inputs are donated — their buffers recycle into
    the record banks.

    Returns per-record arrays of static length 3*(n-1) (internal, left
    leaf, right leaf banks; invalid records sort to the end) plus the
    scalar counts the host must read to size phase B's static tables.
    """
    i32 = jnp.int32
    ni = n - 1
    iar = jnp.arange(ni, dtype=i32)

    size = last - first + 1
    l_size = split - first + 1
    r_size = last - split
    l_leaf = l_size <= max_leaf
    r_leaf = r_size <= max_leaf
    keep = size > max_leaf
    l_child, r_child = split, split + 1
    okl = keep & ~l_leaf  # left child is a kept internal node
    okr = keep & ~r_leaf

    # ---- parent pointers + depth over the KEPT tree ----
    par = jnp.zeros(ni, i32)  # root's parent = itself (jump fixpoint)
    par = par.at[jnp.where(okl, l_child, ni)].set(
        jnp.where(okl, iar, 0), mode="drop")
    par = par.at[jnp.where(okr, r_child, ni)].set(
        jnp.where(okr, iar, 0), mode="drop")
    # depth by pointer doubling over parent links: log2(MAX_DEPTH)
    # rounds instead of MAX_DEPTH scatter passes. par[0] == 0 (root
    # self-loop) terminates every chain; non-kept entries read garbage
    # but are never consumed downstream (wroot/anc gate on `keep`).
    depth = jnp.where(iar == 0, 0, 1).astype(i32)
    jmp = par
    for _ in range(MAX_DEPTH.bit_length()):
        # both reads index by jmp: one packed (ni, 2) row gather
        dj = jnp.take(jnp.stack([depth, jmp], axis=1), jmp, axis=0)
        depth = depth + dj[:, 0]
        jmp = dj[:, 1]

    # ---- wide roots: kept nodes at depth % K == 0 ----
    wroot = keep & (depth % K == 0)
    rem = depth % K
    anc = iar  # wide ancestor: jump up (depth % K) parents

    def up(j, a):
        return jnp.where(j < rem, jnp.take(par, a), a)

    anc = jax.lax.fori_loop(0, K - 1, up, anc)
    # wide parent of a wide root = its parent's wide ancestor (the
    # parent sits at depth ≡ K-1, so its own chain tops K levels up)
    anc_up = jnp.take(anc, par)

    # BFS-ordered wide ids: (level, first) is unique per wide root
    # (same-depth nodes have disjoint ranges)
    wkey = jnp.where(wroot, (depth // K) * i32(n) + first, _I32MAX)
    worder = jnp.argsort(wkey).astype(i32)
    wrank = jnp.zeros(ni, i32).at[worder].set(iar)
    nw = wroot.sum()

    # ---- child records: 3 banks of length ni each ----
    def center_key(lo, hi, pax):
        # slot-order key: centroid along the parent's axis, shifted
        # non-negative so f32 bits order as int32
        c = 0.5 * (lo + hi)
        ck = jnp.take_along_axis(c, pax[:, None], axis=1)[:, 0]
        base = jnp.take(scene_lo, pax)
        return jax.lax.bitcast_convert_type(
            jnp.maximum(ck - base, 0.0).astype(jnp.float32), i32)

    # internal bank: every wide root except the binary root
    val_i = wroot & (iar != 0)
    pax_i = jnp.take(axis_i, anc_up)
    bank_i = dict(
        par=jnp.where(val_i, jnp.take(wrank, anc_up), _I32MAX),
        key=center_key(node_lo, node_hi, pax_i),
        meta=wrank,  # identity take: wrank already indexed by node id
        cnt=jnp.zeros(ni, i32),
        a=jnp.zeros(ni, i32),
        leaf=jnp.zeros(ni, i32),
        lo=node_lo, hi=node_hi,
    )
    # left / right collapsed-leaf banks
    val_l = keep & l_leaf
    pax_l = jnp.take(axis_i, anc)
    bank_l = dict(
        par=jnp.where(val_l, jnp.take(wrank, anc), _I32MAX),
        key=center_key(lf_lo, lf_hi, pax_l),
        meta=jnp.zeros(ni, i32),
        cnt=l_size, a=first, leaf=val_l.astype(i32),
        lo=lf_lo, hi=lf_hi,
    )
    val_r = keep & r_leaf
    bank_r = dict(
        par=jnp.where(val_r, jnp.take(wrank, anc), _I32MAX),
        key=center_key(rf_lo, rf_hi, pax_l),
        meta=jnp.zeros(ni, i32),
        cnt=r_size, a=r_child, leaf=val_r.astype(i32),
        lo=rf_lo, hi=rf_hi,
    )

    def cat(f):
        return jnp.concatenate([bank_i[f], bank_l[f], bank_r[f]])

    if merge_leaves:
        # ---- leaf merge (r4 sizing probe tools/exp_r4_leafmerge.py):
        # collapsed leaves tile the morton-sorted prim range, so sorted
        # by prim start they are range-adjacent; greedily merging
        # neighbors of the SAME wide parent up to max_leaf removes rows
        # (measured 8.9% at 1M tris) without touching tree shape above
        # the leaves. Two odd-even (run-parity) contraction rounds
        # reach sequential-greedy quality (probe round log).
        from ..core.rowpack import permute_rows

        nl2 = 2 * ni
        l_par = jnp.concatenate([bank_l["par"], bank_r["par"]])
        l_cnt = jnp.concatenate([bank_l["cnt"], bank_r["cnt"]])
        l_a = jnp.concatenate([bank_l["a"], bank_r["a"]])
        l_val = jnp.concatenate([bank_l["leaf"], bank_r["leaf"]])
        l_lo = jnp.concatenate([bank_l["lo"], bank_r["lo"]])
        l_hi = jnp.concatenate([bank_l["hi"], bank_r["hi"]])
        iar2 = jnp.arange(nl2, dtype=i32)

        def sort_leaves(key, par, cnt, a, val, lo, hi):
            o = jnp.argsort(key).astype(i32)
            s = permute_rows(
                dict(par=par, cnt=cnt, a=a, val=val), o)
            s.update(permute_rows(dict(lo=lo, hi=hi), o))
            return s["par"], s["cnt"], s["a"], s["val"], s["lo"], s["hi"]

        l_par, l_cnt, l_a, l_val, l_lo, l_hi = sort_leaves(
            jnp.where(l_val == 1, l_a, _I32MAX),
            l_par, l_cnt, l_a, l_val, l_lo, l_hi)
        for _ in range(2):
            nxt_par = jnp.roll(l_par, -1)
            nxt_cnt = jnp.roll(l_cnt, -1)
            nxt_val = jnp.roll(l_val, -1)
            nxt_lo = jnp.roll(l_lo, -1, axis=0)
            nxt_hi = jnp.roll(l_hi, -1, axis=0)
            ok = ((l_val == 1) & (nxt_val == 1)
                  & (l_par == nxt_par)
                  & (l_cnt + nxt_cnt <= max_leaf))
            ok = ok.at[-1].set(False)
            # run parity: merge i with i+1 only at even offsets within
            # each maximal ok-run (run first via cumulative max)
            start = jnp.concatenate(
                [jnp.ones((1,), bool), ~ok[:-1]])
            run_first = jax.lax.cummax(
                jnp.where(start, iar2, i32(-1)))
            do = ok & ((iar2 - run_first) % 2 == 0)
            absorbed = jnp.concatenate(
                [jnp.zeros((1,), bool), do[:-1]])
            l_cnt = jnp.where(do, l_cnt + nxt_cnt, l_cnt)
            l_lo = jnp.where(do[:, None], jnp.minimum(l_lo, nxt_lo),
                             l_lo)
            l_hi = jnp.where(do[:, None], jnp.maximum(l_hi, nxt_hi),
                             l_hi)
            l_val = jnp.where(absorbed, i32(0), l_val)
            # compact survivors back to adjacency for the next round
            l_par, l_cnt, l_a, l_val, l_lo, l_hi = sort_leaves(
                jnp.where(l_val == 1, iar2, _I32MAX),
                l_par, l_cnt, l_a, l_val, l_lo, l_hi)
        # recompute slot keys for merged boxes (axis of the wide
        # parent, by output rank)
        axis_by_rank = jnp.take(axis_i, worder)
        pax_m = jnp.take(
            axis_by_rank, jnp.clip(l_par, 0, ni - 1))
        l_key = center_key(l_lo, l_hi, pax_m)
        dead = l_val != 1
        l_par = jnp.where(dead, _I32MAX, l_par)

        bank_merge = dict(
            par=l_par, key=l_key,
            meta=jnp.zeros(nl2, i32), cnt=l_cnt, a=l_a,
            leaf=l_val, lo=l_lo, hi=l_hi)
        cat = lambda f: jnp.concatenate([bank_i[f], bank_merge[f]])

    rp, rk = cat("par"), cat("key")
    # lexsort by (parent, center key) as two stable argsorts + payload
    # gathers — a 12-operand variadic sort drags every payload through
    # the whole sorting network (~2x the records' bytes per stage)
    idx1 = jnp.argsort(rk, stable=True)
    perm = jnp.take(idx1, jnp.argsort(jnp.take(rp, idx1), stable=True))
    # payload columns ride packed row gathers (core/rowpack) — in TWO
    # groups, not one: a single (3n, 11) pack + its gather output peak
    # at ~2.6 GB live at 10M tris, and the 10M build's HBM headroom is
    # externally variable (RESOURCE_EXHAUSTED class, exp_r4_devbuild*);
    # two ~half-size groups trade one extra gather for half the peak
    from ..core.rowpack import permute_rows

    srec = permute_rows(
        dict(par=rp, meta=cat("meta"), cnt=cat("cnt"), a=cat("a"),
             leaf=cat("leaf")),
        perm,
    )
    srec.update(permute_rows(dict(lo=cat("lo"), hi=cat("hi")), perm))
    sp, s_meta, s_cnt = srec["par"], srec["meta"], srec["cnt"]
    s_a, s_leaf = srec["a"], srec["leaf"]
    slo0, slo1, slo2 = (srec["lo"][:, k] for k in range(3))
    shi0, shi1, shi2 = (srec["hi"][:, k] for k in range(3))
    leaf_rank = jnp.cumsum(s_leaf) - s_leaf
    n_rows = s_leaf.sum()
    s_meta = jnp.where(s_leaf == 1, -(leaf_rank + 1), s_meta)

    wide_depth = jnp.where(wroot, depth, 0).max() // K + 1
    node_axis = jnp.take(axis_i, worder)  # by output node id
    return (order, sp, s_meta, s_cnt, s_a, s_leaf, leaf_rank,
            (slo0, slo1, slo2, shi0, shi1, shi2), node_axis,
            nw, n_rows, wide_depth)


def _woop_rows(tris, pids, max_leaf: int, nrows_pad: int):
    """Woop unit-triangle transform rows from per-slot gathered
    triangles: same layout as ``build_woop_leafs`` (12 f32 per tri —
    [M row-major | anchor p0] at lanes 12t, prim ids at lane 108+t).

    The host builder computes M in f64 (bvh8._woop_transforms_from);
    here the cross products run as Dekker two-product differences in
    f32 (exact to one rounding each), so entries agree with the
    f64-then-round path to ~1-2 ulp — inside the turbo intersector's
    documented deviation envelope (it is not the parity engine).
    """
    f32 = jnp.float32

    def cross_exact(x, y):
        return (
            _exact_prod_diff(x[1], y[2], x[2], y[1]),
            _exact_prod_diff(x[2], y[0], x[0], y[2]),
            _exact_prod_diff(x[0], y[1], x[1], y[0]),
        )

    parts = []
    for t in range(max_leaf):
        g = tris[t]  # (nrows_pad, 9) = p0 p1 p2
        p0 = tuple(g[:, k] for k in range(3))
        e1 = tuple(g[:, 3 + k] - g[:, k] for k in range(3))
        e2 = tuple(g[:, 6 + k] - g[:, k] for k in range(3))
        nrm = cross_exact(e1, e2)
        det = nrm[0] * nrm[0] + nrm[1] * nrm[1] + nrm[2] * nrm[2]
        ok = det > 0.0
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        r0 = cross_exact(e2, nrm)
        r1 = cross_exact(nrm, e1)
        cols = (
            [r0[k] * inv for k in range(3)]
            + [r1[k] * inv for k in range(3)]
            + [nrm[k] * inv for k in range(3)]
            + list(p0)
        )
        parts.append(jnp.stack(cols, axis=1).astype(f32))
    pad = jnp.zeros((nrows_pad, 108 - 12 * max_leaf), f32)
    pid_block = jnp.stack(pids, axis=1).astype(f32)
    tail = jnp.zeros((nrows_pad, 128 - 108 - max_leaf), f32)
    return jnp.concatenate(parts + [pad, pid_block, tail], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("n", "width", "max_leaf", "nw_pad", "nrows_pad",
                     "woop"),
    # record arrays (3*(n-1) rows each) die inside this phase — donate
    # so their ~1.3 GB at 10M tris recycles into the tables
    donate_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10))
def _phase_b(vertices, faces, order, sp, s_meta, s_cnt, s_a, s_leaf,
             leaf_rank, sboxes, node_axis,
             n: int, width: int, max_leaf: int,
             nw_pad: int, nrows_pad: int, woop: bool = False):
    """Static-shape table fill: gather child records into node rows,
    gather morton-ordered triangles into leaf rows. No scatters touch
    the tables — every write is a full column (the sort in phase A
    already grouped records by destination node)."""
    i32 = jnp.int32
    f32 = jnp.float32
    slo0, slo1, slo2, shi0, shi1, shi2 = sboxes
    nrec = sp.shape[0]
    W = width
    NR = 1 if W == 16 else W // 8

    seg = jnp.searchsorted(sp, jnp.arange(nw_pad + 1, dtype=i32)).astype(i32)

    if W == 16:
        # ---- packed path: per slot, per-component 1D gathers (a row
        # gather of a stacked (3n, 8) record matrix costs a 16x-padded
        # T(8,128) temp at 10M tris — the 10M HBM OOM class); the node
        # table is a single lane concat (box lanes 6s..6s+5, meta 96+s,
        # count 112+s) — no .at column writes
        s_meta_f = s_meta.astype(f32)
        s_cnt_f = s_cnt.astype(f32)
        axis_f = (node_axis[:nw_pad] if node_axis.shape[0] >= nw_pad
                  else jnp.pad(node_axis,
                               (0, nw_pad - node_axis.shape[0]))).astype(f32)
        boxes, metas, cnts = [], [], []
        for s in range(W):
            idx = seg[:-1] + s
            valid = idx < seg[1:]
            idxc = jnp.clip(idx, 0, nrec - 1)
            comps = [jnp.take(x, idxc) for x in
                     (slo0, slo1, slo2, shi0, shi1, shi2)]
            box = jnp.stack(
                [jnp.where(valid, comps[k],
                           f32(EMPTY_BIG if k < 3 else -EMPTY_BIG))
                 for k in range(6)], axis=1)
            boxes.append(box)
            metas.append(jnp.where(valid, jnp.take(s_meta_f, idxc), 0.0))
            cnt = jnp.where(valid, jnp.take(s_cnt_f, idxc), 0.0)
            if s == 0:
                # order axis rides the child-0 count lane (cnt + 16*axis)
                cnt = cnt + 16.0 * axis_f
            cnts.append(cnt)
        nodes = jnp.concatenate(
            boxes + [jnp.stack(metas, axis=1), jnp.stack(cnts, axis=1)],
            axis=1)

        # ---- leaf rows: (n, 10) sorted soup [v0 v1 v2 pid], then one
        # row gather per leaf slot, CHUNKED with lax.map so the narrow
        # (rows, 9/10) temporaries (~13x lane padding under T(8,128))
        # stay bounded at 10M tris
        A = jnp.zeros(nrows_pad, i32).at[
            jnp.where(s_leaf == 1, leaf_rank, nrows_pad)].set(
            jnp.where(s_leaf == 1, s_a, 0), mode="drop")
        v0 = jnp.take(vertices, faces[:, 0], axis=0)
        v1 = jnp.take(vertices, faces[:, 1], axis=0)
        v2 = jnp.take(vertices, faces[:, 2], axis=0)
        soup = jnp.concatenate(
            [v0, v1, v2, jnp.arange(n, dtype=f32)[:, None]], axis=1)
        soup = jnp.take(soup, order, axis=0)  # morton order; col 9 = prim

        def leaf_chunk(Ac):
            m = Ac.shape[0]
            vparts, pids = [], []
            for t in range(max_leaf):
                g = jnp.take(soup, jnp.clip(Ac + t, 0, n - 1), axis=0)
                vparts.append(g[:, :9])
                pids.append(g[:, 9])
            rows = jnp.concatenate(
                vparts
                + [jnp.zeros((m, 90 - 9 * max_leaf), f32)]
                + [jnp.stack(pids, axis=1)]
                + [jnp.zeros((m, 128 - 90 - max_leaf), f32)],
                axis=1)
            if woop:
                return rows, _woop_rows(vparts, pids, max_leaf, m)
            return rows, jnp.zeros((m, 0), f32)

        # ~64K rows per chunk caps the padded temps at ~300 MB
        ch = max(1, min(nrows_pad // 65536, 32))
        while nrows_pad % ch:
            ch -= 1
        if ch <= 1:
            leafs, lw = leaf_chunk(A)
        else:
            leafs, lw = jax.lax.map(leaf_chunk, A.reshape(ch, -1))
            leafs = leafs.reshape(nrows_pad, 128)
            lw = lw.reshape(nrows_pad, -1)
        if woop:
            return nodes, leafs, lw
        return nodes, leafs, None

    # empty node pattern: inverted boxes in every slot
    empty = np.zeros((NR, 128), np.float32)
    if W == 16:
        for ax in range(3):
            empty[0, ax:96:6] = EMPTY_BIG
            empty[0, 3 + ax:96:6] = -EMPTY_BIG
    else:
        for r in range(NR):
            empty[r, 0:64:8] = EMPTY_BIG
            empty[r, 1:64:8] = EMPTY_BIG
            empty[r, 2:64:8] = EMPTY_BIG
            empty[r, 3:64:8] = -EMPTY_BIG
            empty[r, 4:64:8] = -EMPTY_BIG
            empty[r, 5:64:8] = -EMPTY_BIG
    nodes = jnp.broadcast_to(
        jnp.asarray(empty), (nw_pad, NR, 128)).reshape(nw_pad, NR * 128)

    axis_f = node_axis[:nw_pad].astype(f32) if node_axis.shape[0] >= nw_pad \
        else jnp.pad(node_axis, (0, nw_pad - node_axis.shape[0])).astype(f32)

    for s in range(W):
        idx = seg[:-1] + s
        valid = idx < seg[1:]
        idxc = jnp.clip(idx, 0, nrec - 1)
        comps = [jnp.take(x, idxc) for x in
                 (slo0, slo1, slo2, shi0, shi1, shi2)]
        meta = jnp.take(s_meta, idxc).astype(f32)
        cnt = jnp.take(s_cnt, idxc).astype(f32)
        if W == 16:
            box_lanes = [6 * s + k for k in range(6)]
            meta_lane, cnt_lane = 96 + s, 112 + s
        else:
            r, c = divmod(s, 8)
            box_lanes = [r * 128 + 8 * c + k for k in range(6)]
            meta_lane, cnt_lane = r * 128 + 64 + c, r * 128 + 72 + c
        for k, lane in enumerate(box_lanes):
            fill = EMPTY_BIG if k < 3 else -EMPTY_BIG
            nodes = nodes.at[:, lane].set(
                jnp.where(valid, comps[k], f32(fill)))
        if W == 16 and s == 0:
            # order axis rides the child-0 count lane (cnt + 16*axis)
            cnt = cnt + 16.0 * axis_f
        nodes = nodes.at[:, meta_lane].set(jnp.where(valid, meta, 0.0))
        nodes = nodes.at[:, cnt_lane].set(jnp.where(valid, cnt, 0.0))
    if W != 16:
        nodes = nodes.at[:, 80].set(axis_f)
    nodes = nodes.reshape(nw_pad * NR, 128)

    # ---- leaf rows: pure gathers (row id == leaf record rank) ----
    A = jnp.zeros(nrows_pad, i32).at[
        jnp.where(s_leaf == 1, leaf_rank, nrows_pad)].set(
        jnp.where(s_leaf == 1, s_a, 0), mode="drop")
    leafs = jnp.zeros((nrows_pad, 128), f32)
    tris_w, pids_w = [], []
    for t in range(max_leaf):
        src = jnp.clip(A + t, 0, n - 1)
        prim = jnp.take(order, src)
        f3 = jnp.take(faces, prim, axis=0)
        vcols = []
        for vdx in range(3):
            vv = jnp.take(vertices, f3[:, vdx], axis=0)
            for k in range(3):
                leafs = leafs.at[:, 9 * t + 3 * vdx + k].set(vv[:, k])
                vcols.append(vv[:, k])
        leafs = leafs.at[:, 90 + t].set(prim.astype(f32))
        if woop:
            tris_w.append(jnp.stack(vcols, axis=1))
            pids_w.append(prim.astype(f32))
    if woop:
        return nodes, leafs, _woop_rows(tris_w, pids_w, max_leaf,
                                        nrows_pad)
    return nodes, leafs, None


def _preorder_impl(nodes, leafs, leafs_woop, depth: int):
    """DFS-preorder renumbering of finished width-16 tables, on device.

    Pure relabeling — traversal visits the same nodes in the same order,
    records are bit-identical (host-side proof: exp_r5_devorder,
    prim/t diffs 0) — but a pop's child fetch address becomes usually
    adjacent, like the host collapse's emission order: measured
    129.8 -> 132.6 Mrays/s on the 1M-tri headline (exp_r5_devorder).
    Pad rows (empty boxes, incl. the kernel's park row) keep their
    positions; the root stays row 0.
    """
    i32 = jnp.int32
    NW = nodes.shape[0]
    NL = leafs.shape[0]
    valid = nodes[:, 0:96:6] <= nodes[:, 3:96:6]  # (NW, 16) slot live
    meta = nodes[:, 96:112].astype(i32)
    is_int = valid & (meta >= 0)
    is_leaf = valid & (meta < 0)
    child = jnp.where(is_int, meta, 0)
    rows16 = jnp.broadcast_to(
        jnp.arange(NW, dtype=i32)[:, None], (NW, 16))

    # reachability (real nodes; pads have no parents and no slots)
    reach = jnp.zeros(NW, i32).at[
        jnp.where(is_int, child, NW).reshape(-1)
    ].set(i32(1), mode="drop").at[0].set(i32(1))

    # subtree node counts, bottom-up fixpoint (depth iterations)
    size = jnp.ones(NW, i32)
    for _ in range(depth):
        size = 1 + jnp.where(is_int, jnp.take(size, child), 0).sum(1)

    # preorder ids, top-down fixpoint: child = parent + 1 + sizes of
    # preceding INTERNAL siblings (leaf slots consume no node ids)
    pre = jnp.zeros(NW, i32)
    for _ in range(depth + 1):
        csz = jnp.where(is_int, jnp.take(size, child), 0)
        excl = jnp.cumsum(csz, axis=1) - csz
        tgt = jnp.where(is_int, child, NW).reshape(-1)
        pre = pre.at[tgt].set(
            (pre[:, None] + 1 + excl).reshape(-1), mode="drop")
    pad_rank = jnp.cumsum(1 - reach) - (1 - reach)
    new_node = jnp.where(reach == 1, pre, reach.sum() + pad_rank)

    # leaf rows in first-touch (preorder, slot-order) order
    lrow = jnp.where(is_leaf, -meta - 1, 0)
    lkey = jnp.where(
        is_leaf, jnp.take(new_node, rows16) * 16
        + jnp.arange(16, dtype=i32)[None, :], _I32MAX).reshape(-1)
    lorder = jnp.argsort(lkey).astype(i32)  # leaf slots first
    touched = jnp.zeros(NL, i32).at[
        jnp.where(is_leaf, lrow, NL).reshape(-1)].set(
        i32(1), mode="drop")
    srow = jnp.take(lrow.reshape(-1), lorder)
    skey = jnp.take(lkey, lorder)
    # ranks = dense positions in lorder; invalid keys (sorted last)
    # scatter to the drop slot, never a real row
    new_leaf = jnp.zeros(NL, i32).at[
        jnp.where(skey != _I32MAX, srow, NL)
    ].set(jnp.arange(lkey.shape[0], dtype=i32), mode="drop")
    # untouched pad rows append after the touched ones, order kept
    new_leaf = jnp.where(
        touched == 1, new_leaf,
        touched.sum() + jnp.cumsum(1 - touched) - (1 - touched))

    new_meta = jnp.where(is_int, jnp.take(new_node, child), meta)
    new_meta = jnp.where(
        is_leaf, -(jnp.take(new_leaf, lrow) + 1), new_meta)
    nodes = nodes.at[:, 96:112].set(new_meta.astype(nodes.dtype))
    nodes = jnp.zeros_like(nodes).at[new_node].set(nodes)
    leafs = jnp.zeros_like(leafs).at[new_leaf].set(leafs)
    if leafs_woop is not None:
        leafs_woop = jnp.zeros_like(leafs_woop).at[new_leaf].set(
            leafs_woop)
    return nodes, leafs, leafs_woop


_preorder_jit = jax.jit(_preorder_impl, static_argnames=("depth",))
# donating variant for the internal call inside collapse_lbvh_device,
# where the un-renumbered tables die here anyway — at 10M tris the
# relabeling scatter would otherwise hold a second ~GB-scale copy of
# every table alive
_preorder_jit_donate = jax.jit(_preorder_impl, static_argnames=("depth",),
                               donate_argnums=(0, 1, 2))


def preorder_device(scene: BVH8Scene, donate: bool = False) -> BVH8Scene:
    """Renumber a width-16 scene's tables into DFS preorder on device
    (see _preorder_impl). No-op relabeling for traversal semantics.

    ``donate=True`` recycles the input tables' device buffers into the
    output (halves transient HBM at large scales) — the caller's
    ``scene`` arrays are INVALIDATED; only use when the input scene is
    dead after the call."""
    if getattr(scene, "width", 8) != 16:
        raise ValueError("preorder_device supports width-16 tables")
    impl = _preorder_jit_donate if donate else _preorder_jit
    nodes, leafs, woop = impl(
        scene.nodes, scene.leafs, scene.leafs_woop,
        depth=int(scene.depth))
    return scene._replace(nodes=nodes, leafs=leafs, leafs_woop=woop)


def collapse_lbvh_device(
    vertices,
    faces,
    width: int = 16,
    max_leaf: int = 9,
    woop: bool = False,
    sah_levels: int = 0,
    sah_bins: int = 16,
    sah_stop: int = 64,
    merge_leaves: bool | None = None,
    preorder: bool | None = None,
) -> BVH8Scene:
    """One-call device-side scene build: triangles in, packet-kernel
    BVH tables out, everything on the accelerator (two scalar count
    readbacks between the jitted phases). Tables are bucket-padded to
    powers of two — the trailing pad node doubles as the kernel's park
    row (empty boxes never hit).

    ``woop=True`` also bakes the turbo intersector's unit-triangle
    table on device (``leafs_woop``, layout of build_woop_leafs), so
    the full turbo path needs no host pass either.

    ``merge_leaves``: greedily merge range-adjacent collapsed leaves of
    the same wide parent up to ``max_leaf`` (two run-parity contraction
    rounds; ~8.9% fewer leaf rows at 1M tris, exp_r4_leafmerge) —
    tree shape above the leaves is unchanged. ``preorder``: renumber
    the finished tables into DFS preorder (pure relabeling, records
    bit-identical; +2% traced, exp_r5_devorder). Both default to AUTO
    (``None``): on up to ``_EXTRAS_MAX_N`` prims, off above — the
    merge's sorted copies of the 2n leaf banks and the preorder's
    relabel scatters push the 10M build past the v5e's transient HBM
    peak (RESOURCE_EXHAUSTED on an otherwise-quiet chip,
    tools/logs/matrix_r5_tenm4.log; 1M measured green,
    tools/logs/exp_r5_devorder.log). Pass ``True`` to force."""
    if width not in (8, 16):
        raise ValueError(f"width must be 8 or 16: {width}")
    if not 1 <= max_leaf <= min(MAX_LEAF_TRIS, 15):
        raise ValueError(f"max_leaf must be in [1, 15]: {max_leaf}")
    if woop and max_leaf > 9:
        raise ValueError("woop rows hold <= 9 tris; use max_leaf <= 9")
    vertices = jnp.asarray(vertices, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    n = int(faces.shape[0])
    if merge_leaves is None:
        merge_leaves = n <= _EXTRAS_MAX_N
    if preorder is None:
        preorder = n <= _EXTRAS_MAX_N
    if n > (1 << 24):
        raise ValueError("BVH8 float-int lanes are exact to 2^24 prims")
    NR = 1 if width == 16 else width // 8
    K = 4 if width == 16 else 3

    if n == 0:
        raise ValueError("no primitives")
    if n <= max_leaf:
        # tiny scene: one node, one leaf row (host-assembled)
        v = np.asarray(vertices)
        f = np.asarray(faces)
        lo = v[f].min(axis=(0, 1))
        hi = v[f].max(axis=(0, 1))
        nodes = np.zeros((2 * NR, 128), np.float32)
        if width == 16:
            for ax in range(3):
                nodes[0::NR, ax:96:6] = EMPTY_BIG
                nodes[0::NR, 3 + ax:96:6] = -EMPTY_BIG
            nodes[0, 0:3], nodes[0, 3:6] = lo, hi
            nodes[0, 96] = -1.0
            nodes[0, 112] = float(n)
        else:
            for r in range(2 * NR):
                for k in range(3):
                    nodes[r, k:64:8] = EMPTY_BIG
                    nodes[r, 3 + k:64:8] = -EMPTY_BIG
            nodes[0, 0:3], nodes[0, 3:6] = lo, hi
            nodes[0, 64] = -1.0
            nodes[0, 72] = float(n)
        leafs = np.zeros((1, 128), np.float32)
        for t in range(n):
            leafs[0, 9 * t: 9 * t + 9] = v[f[t]].reshape(-1)
            leafs[0, 90 + t] = float(t)
        leafs_woop = None
        if woop:
            from .bvh8 import _woop_transforms_from

            wflat = _woop_transforms_from(v, f, np.arange(n))
            lw = np.zeros((1, 128), np.float32)
            for t in range(n):
                lw[0, 12 * t: 12 * t + 12] = wflat[t]
                lw[0, 108 + t] = float(t)
            leafs_woop = jnp.asarray(lw)
        return BVH8Scene(
            nodes=jnp.asarray(nodes), leafs=jnp.asarray(leafs),
            num_nodes=1, num_leaf_rows=1, depth=1, max_leaf=n,
            width=width, leafs_woop=leafs_woop)

    import os as _os
    _dbg = bool(_os.environ.get("NANORT_DEVBUILD_DEBUG"))

    def _memstat(tag, *sync):
        if _dbg:
            jax.block_until_ready(sync)
            st = jax.local_devices()[0].memory_stats() or {}
            print(f"# devbuild {tag}: "
                  f"in_use={st.get('bytes_in_use', 0)/1e9:.2f}GB "
                  f"peak={st.get('peak_bytes_in_use', 0)/1e9:.2f}GB",
                  flush=True)

    topo = _phase_a_topo(vertices, faces, n=n, max_leaf=max_leaf,
                         sah_levels=sah_levels, sah_bins=sah_bins,
                         sah_stop=sah_stop)
    _memstat("phase_a_topo", topo)
    (order, sp, s_meta, s_cnt, s_a, s_leaf, leaf_rank, sboxes,
     node_axis, nw, n_rows, wide_depth) = _phase_a_records(
        *topo, n=n, max_leaf=max_leaf, K=K,
        merge_leaves=bool(merge_leaves) and width == 16)
    _memstat("phase_a_records", sp)
    nw_i, nrows_i, depth_i = int(nw), int(n_rows), int(wide_depth)
    nw_pad = _next_pow2(nw_i + 1)  # +1: trailing pad node = park row
    nrows_pad = _next_pow2(max(nrows_i, 1))
    nodes, leafs, leafs_woop = _phase_b(
        vertices, faces, order, sp, s_meta, s_cnt, s_a, s_leaf,
        leaf_rank, sboxes, node_axis,
        n=n, width=width, max_leaf=max_leaf,
        nw_pad=nw_pad, nrows_pad=nrows_pad, woop=woop)
    _memstat("phase_b", nodes)
    scene = BVH8Scene(
        nodes=nodes, leafs=leafs, num_nodes=nw_i, num_leaf_rows=nrows_i,
        depth=depth_i, max_leaf=max_leaf, width=width,
        leafs_woop=leafs_woop)
    if preorder and width == 16:
        scene = preorder_device(scene, donate=True)
        _memstat("preorder", scene.nodes)
    return scene
