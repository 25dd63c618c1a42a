"""Device-side LBVH builder (Morton sort + Karras'12 topology), in JAX.

The reference's parallel build is a CPU thread pool over subtrees
(nanort.h:1997-2073); the TPU-native equivalent (SURVEY.md §2.7, step 6 of
the build plan) is a fully data-parallel construction that runs jitted on
the accelerator:

  1. 30-bit Morton codes of primitive centroids (bit-interleave via magic
     masks; VPU integer ops),
  2. ``jnp.argsort`` of the codes (XLA sort),
  3. Karras (HPG 2012) internal-node ranges/splits via vectorized
     galloping + binary searches on common-prefix lengths (duplicate
     codes broken by index using population-count-based clz),
  4. subtree collapse into leaves of <= max_leaf primitives (leaves are
     keyed by (parent, side) — ranges, not single Karras leaves),
  5. bottom-up bbox refit by depth-bounded fixed-point iteration,
  6. DFS-preorder numbering computed in parallel from subtree sizes
     (top-down fixed point), emitting the same linear ``BVHNode`` layout
     as the reference builder (left == parent + 1, contiguous leaf
     ranges) — so every traversal engine and the Dump serialization work
     unchanged.

LBVH trees trace ~10-30% slower than binned SAH (the known quality gap);
the framework defaults to the native SAH builder and offers this one for
geometry generated on-device.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bvh import BVH
from ..core.options import BVHBuildStatistics

MAX_DEPTH = 64  # fixed-point iteration bound


def _expand_bits(v):
    """Spread 10 bits to every 3rd position (standard Morton magic).
    Masks above 2^31 must be explicit uint32: bare Python literals
    overflow the int32 weak type when x64 is off."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(centers, bmin, bmax):
    """30-bit Morton codes of normalized centroids."""
    ext = jnp.maximum(bmax - bmin, 1e-30)
    q = jnp.clip((centers - bmin) / ext * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (
        (_expand_bits(q[:, 0]) << 2)
        | (_expand_bits(q[:, 1]) << 1)
        | _expand_bits(q[:, 2])
    ).astype(jnp.uint32)


def _clz32(x):
    x = x | (x >> 1)
    x = x | (x >> 2)
    x = x | (x >> 4)
    x = x | (x >> 8)
    x = x | (x >> 16)
    return 32 - jax.lax.population_count(x).astype(jnp.int32)


def _morton_deltas(codes, n: int):
    """Adjacent-pair deltas D[k] = delta(k, k+1) over sorted codes
    (common-prefix length; duplicate codes tie-broken by index exactly
    as Karras's pairwise delta, values in [0, 64])."""
    i32 = jnp.int32
    m = n - 1
    i = jnp.arange(m, dtype=i32)
    x = codes[:-1] ^ codes[1:]
    return jnp.where(
        x == 0,
        32 + _clz32(i.astype(jnp.uint32) ^ (i + 1).astype(jnp.uint32)),
        _clz32(x),
    ).astype(i32)


# int8 sentinels for the sparse-table descent. Real deltas live in
# [D_FLOOR+3, 64]: Morton deltas are >= 0; agglomerative boundary
# overrides (hybrid_deltas) go down to -(I_SA + log2 rounds + 2).
_D_PAD = np.int8(-128)   # out-of-range table pad: fails every `> dmin`
_D_EDGE = np.int8(-125)  # virtual delta outside [0, n): below all real
D_FLOOR = -120           # overrides must stay above this


def _karras_topology(codes, n: int):
    """(first, last, split) per internal node over sorted codes — the
    Cartesian-tree-of-deltas formulation (see _topology_from_deltas).
    Results are identical to Karras'12 (nanort.h has no LBVH; this
    matches Karras directly)."""
    return _topology_from_deltas(_morton_deltas(codes, n), n)


@functools.partial(jax.jit, static_argnames=("n",))
def _topology_from_deltas(D, n: int):
    """(first, last, split) per internal node of the binary tree over
    contiguous ranges of the sorted array defined by the adjacent-delta
    array ``D`` (n-1,): every node splits at the LEFTMOST minimum delta
    of its range (the Cartesian tree of D), the standard Karras'12
    contract generalized to ARBITRARY deltas in [D_FLOOR+3, 64] — e.g.
    hybrid_deltas' negative agglomerative boundary overrides.

    Karras'12 formulated per-node galloping + two binary searches over
    pairwise deltas (~150 scalar gathers of the code array at 10M
    tris). This uses the min-composition property instead — delta(a, b)
    == min D[a..b-1] — so

      * the range end is a greedy aligned sparse-table descent — ONE
        table gather per bit of range length, and
      * the split is a second descent from ``first`` extending while
        the window min stays above the node delta.

    Node indexing: internal node i has i as one of its range endpoints;
    children of the node splitting at s are internal nodes s (left,
    range [first, s]) and s+1 (right, [s+1, last]) — the endpoint
    bijection every downstream consumer (device_collapse, build_lbvh)
    relies on.
    """
    i32 = jnp.int32
    m = n - 1
    i = jnp.arange(m, dtype=i32)

    # per-level sparse min-tables over D, int8 (real deltas fit), padded
    # with _D_PAD so out-of-range windows FAIL the `> dmin` test. Levels
    # stay separate arrays: every descent iteration uses one STATIC
    # level, so no flattened copy is ever materialized (~1 GB at 10M).
    n_lv = max(int(m).bit_length(), 1)
    levels = [D.astype(jnp.int8)]
    for k in range(1, n_lv):
        s = 1 << (k - 1)
        t = levels[-1]
        ext = jnp.full_like(t, _D_PAD)
        if s < m:
            ext = ext.at[: m - s].set(t[s:])
        levels.append(jnp.minimum(t, ext))

    dp1 = D  # delta(i, i+1)
    dm1 = jnp.where(
        i > 0, jnp.concatenate([D[:1], D[:-1]]), i32(_D_EDGE)
    )
    d = jnp.where(dp1 >= dm1, 1, -1).astype(i32)  # ties go right (Karras)
    dmin = jnp.where(d > 0, dm1, dp1)

    # greedy descent: extend the run [i, i+l*d] while every adjacent
    # delta inside stays > dmin; windows align to the current length so
    # each level costs one gather of T_k. Taken windows tile the final
    # span exactly, so their running min IS delta(i, j) (= dnode).
    l = jnp.zeros(m, i32)
    dnode = jnp.full(m, np.int32(2**31 - 1), i32)
    for k in range(n_lv - 1, -1, -1):
        w = i32(1 << k)
        # window of D indices: d=+1 -> [i+l, i+l+w-1]; d=-1 -> [i-l-w, i-l-1]
        p = jnp.where(d > 0, i + l, i - l - w)
        # windows STARTING out of range must fail explicitly (the clip
        # below would alias them onto valid rows); windows merely
        # EXTENDING past m-1 fail via the -1 pad
        ok = (p >= 0) & (p <= m - 1)
        v = jnp.take(levels[k], jnp.clip(p, 0, m - 1)).astype(i32)
        take = ok & (v > dmin)
        l = jnp.where(take, l + w, l)
        dnode = jnp.where(take, jnp.minimum(dnode, v), dnode)

    j = i + l * d
    first = jnp.minimum(i, j)
    last = jnp.maximum(i, j)

    # split = leftmost position p of D == dnode in [first, last-1]: a
    # second descent extends from `first` while min D stays > dnode
    # (windows always start <= p, so any overextension contains D[p]
    # == dnode and fails — no bounds gate needed)
    sl = jnp.zeros(m, i32)
    for k in range(n_lv - 1, -1, -1):
        w = i32(1 << k)
        v = jnp.take(
            levels[k], jnp.clip(first + sl, 0, m - 1)
        ).astype(i32)
        sl = jnp.where(v > dnode, sl + w, sl)
    split = first + sl
    return first, last, split


@functools.partial(jax.jit, static_argnames=("n", "C", "i_sa"))
def hybrid_deltas(codes, sorted_lo, sorted_hi, n: int, C: int = 32,
                  i_sa: int = 88):
    """Adjacent-delta array whose Cartesian tree is a HYBRID topology:
    a surface-area-greedy agglomerative tree over Morton-ordered
    clusters of ``C`` prims at the TOP, Karras/Morton topology within
    clusters. Feed to _topology_from_deltas.

    MEASURED NEGATIVE RESULT (round 3, do not re-try blindly): on a
    uv-sphere and a random-triangle scene, this agglomerative top tree
    scores ~20% WORSE true SAH cost than plain Karras (sphere 73.1 vs
    60.1; the sequential exact-greedy oracle matches the vectorized
    result bit-for-bit, so it is the algorithm, not the code), and a
    top-down SAH sweep restricted to every-C-th split position is
    equally worse (74.5). Interpretation: for trees constrained to
    contiguous Morton-order ranges, Karras's highest-bit split IS a
    spatial median cut and is already near-optimal at the top; the
    LBVH-vs-SAH quality gap lives in the primitive ORDER, not the
    split choice. Kept as tested machinery for arbitrary-delta
    topologies (and for orders other than Morton, where a data-driven
    top tree may win).

    The agglomeration runs over nc = ceil(n/C) cluster slots as a
    doubly-linked list: each round, every adjacent pair (i, next(i))
    whose merged surface area is a strict lexicographic local minimum
    (ties by index) merges; the boundary consumed at global step t gets
    delta -(t+2). Ancestor boundaries merge later -> smaller deltas, so
    the Cartesian tree reproduces the agglomerative hierarchy exactly
    (two same-step boundaries are always separated by a later one).
    ``i_sa`` SA-guided rounds are followed by ceil(log2(nc))+1 forced
    parity-merge rounds, so the process always terminates with every
    boundary consumed inside the int8 delta floor (asserted)."""
    D = _morton_deltas(codes, n)
    nc = -(-n // C)
    if nc <= 1:
        return D
    i32 = jnp.int32
    f32 = jnp.float32
    BIG = f32(3.0e38)
    tail = max(int(nc - 1).bit_length(), 1) + 1
    if i_sa + tail + 2 > -D_FLOOR - 3:
        raise ValueError("i_sa too large for the int8 delta floor")

    m = jnp.concatenate([sorted_lo, -sorted_hi], axis=1)  # (n, 6) min-form
    pad = nc * C - n
    mp = jnp.concatenate(
        [m, jnp.full((pad, 6), BIG, f32)]).reshape(nc, C, 6)
    box0 = mp.min(axis=1)  # (nc, 6)

    idx = jnp.arange(nc, dtype=i32)
    st0 = dict(
        box=box0,
        nxt=idx + 1,            # nc == none
        prv=idx - 1,            # -1 == none
        last=idx,               # cluster-unit end of slot's range
        alive=jnp.ones(nc, bool),
        t_of=jnp.zeros(max(nc - 1, 1), i32),
    )

    def sa_of(mrow):
        lo = mrow[:, 0:3]
        hi = -mrow[:, 3:6]
        d = jnp.maximum(hi - lo, 0.0)
        return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

    def round_(t, st, forced):
        box, nxt, prv, last, alive, t_of = (
            st["box"], st["nxt"], st["prv"], st["last"], st["alive"],
            st["t_of"])
        j = jnp.minimum(nxt, nc - 1)
        has_next = alive & (nxt < nc)
        ub = jnp.minimum(box, jnp.take(box, j, axis=0))
        cost = jnp.where(has_next, sa_of(ub), jnp.inf)
        if forced:
            rank = jnp.cumsum(alive.astype(i32)) - 1
            merge = has_next & (rank % 2 == 0)
        else:
            def less(ca, ia, cb, ib):
                return (ca < cb) | ((ca == cb) & (ia < ib))
            pc = jnp.where(
                prv >= 0, jnp.take(cost, jnp.maximum(prv, 0)), jnp.inf)
            nk = jnp.take(cost, j)  # cost of the pair starting at j
            merge = (
                has_next
                & less(cost, idx, pc, jnp.maximum(prv, 0))
                & less(cost, idx, nk, j)
            )
        # consume boundary last[i] at step t (last[i] <= nc-2 whenever
        # has_next holds; non-merging rows scatter out of range -> drop)
        t_of = t_of.at[jnp.where(merge, last, nc)].set(t, mode="drop")
        box = jnp.where(merge[:, None], ub, box)
        last = jnp.where(merge, jnp.take(last, j), last)
        new_next = jnp.where(merge, jnp.take(nxt, j), nxt)
        # kill right partners, relink
        dead = jnp.zeros(nc, bool).at[jnp.where(merge, j, nc)
                                      ].set(True, mode="drop")
        alive = alive & ~dead
        nxt = new_next
        prv = prv.at[jnp.where(merge, jnp.minimum(new_next, nc - 1), nc)
                     ].set(idx, mode="drop")
        return dict(box=box, nxt=nxt, prv=prv, last=last, alive=alive,
                    t_of=t_of)

    st = jax.lax.fori_loop(
        0, i_sa, lambda t, s: round_(t, s, False), st0)
    st = jax.lax.fori_loop(
        i_sa, i_sa + tail, lambda t, s: round_(t, s, True), st)

    t_of = st["t_of"][: nc - 1]
    bidx = (jnp.arange(nc - 1, dtype=i32) + 1) * C - 1
    return D.at[bidx].set(-(t_of + 2))


@functools.partial(jax.jit, static_argnames=("n", "max_leaf"))
def _build_lbvh_jit(prim_bmin, prim_bmax, prim_centers, n: int, max_leaf: int):
    scene_lo = prim_bmin.min(axis=0)
    scene_hi = prim_bmax.max(axis=0)
    codes = morton_codes(prim_centers, scene_lo, scene_hi)
    order = jnp.argsort(codes).astype(jnp.int32)
    codes = jnp.take(codes, order)

    first, last, split = _karras_topology(codes, n)
    ni = n - 1
    size = last - first + 1

    l_first, l_last = first, split
    r_first, r_last = split + 1, last
    l_size = l_last - l_first + 1
    r_size = r_last - r_first + 1
    l_leaf = l_size <= max_leaf  # collapsed-leaf children
    r_leaf = r_size <= max_leaf
    l_child = split  # internal id when not a leaf (Karras child rule)
    r_child = split + 1
    keep = size > max_leaf  # surviving internal nodes

    # ---- bboxes ----
    sorted_lo = jnp.take(prim_bmin, order, axis=0)
    sorted_hi = jnp.take(prim_bmax, order, axis=0)

    def range_bbox(a, count):
        lo = jnp.take(sorted_lo, a, axis=0)
        hi = jnp.take(sorted_hi, a, axis=0)
        for k in range(1, max_leaf):
            valid = k < count
            g = jnp.minimum(a + k, n - 1)
            lo = jnp.where(valid[:, None],
                           jnp.minimum(lo, jnp.take(sorted_lo, g, axis=0)), lo)
            hi = jnp.where(valid[:, None],
                           jnp.maximum(hi, jnp.take(sorted_hi, g, axis=0)), hi)
        return lo, hi

    lf_lo, lf_hi = range_bbox(l_first, l_size)  # left-leaf bbox per parent
    rf_lo, rf_hi = range_bbox(r_first, r_size)

    node_lo = jnp.full((ni, 3), 3e38, jnp.float32)
    node_hi = jnp.full((ni, 3), -3e38, jnp.float32)

    def refit(_, st):
        lo, hi = st
        llo = jnp.where(l_leaf[:, None], lf_lo, jnp.take(lo, l_child, axis=0))
        lhi = jnp.where(l_leaf[:, None], lf_hi, jnp.take(hi, l_child, axis=0))
        rlo = jnp.where(r_leaf[:, None], rf_lo, jnp.take(lo, r_child, axis=0))
        rhi = jnp.where(r_leaf[:, None], rf_hi, jnp.take(hi, r_child, axis=0))
        return jnp.minimum(llo, rlo), jnp.maximum(lhi, rhi)

    node_lo, node_hi = jax.lax.fori_loop(0, MAX_DEPTH, refit, (node_lo, node_hi))
    axis_i = jnp.argmax(node_hi - node_lo, axis=1).astype(jnp.int32)

    # ---- emitted subtree sizes ----
    sizes = jnp.ones(ni, jnp.int32)

    def size_pass(_, s):
        sl = jnp.where(l_leaf, 1, jnp.take(s, l_child))
        sr = jnp.where(r_leaf, 1, jnp.take(s, r_child))
        return 1 + sl + sr

    sizes = jax.lax.fori_loop(0, MAX_DEPTH, size_pass, sizes)

    # ---- DFS preorder (top-down fixed point) ----
    # pre_i[k]: preorder slot of internal k; pre_l/pre_r: slots of k's
    # collapsed leaf children (keyed by parent+side: collision-free).
    pre_i = jnp.zeros(ni, jnp.int32)

    def pre_pass(_, pi):
        sl = jnp.where(l_leaf, 1, jnp.take(sizes, l_child))
        l_pre = pi + 1
        r_pre = pi + 1 + sl
        upd = jnp.zeros(ni, jnp.int32)
        msk = jnp.zeros(ni, bool)
        okl = keep & ~l_leaf
        upd = upd.at[jnp.where(okl, l_child, ni)].add(
            jnp.where(okl, l_pre, 0), mode="drop")
        msk = msk.at[jnp.where(okl, l_child, ni)].set(True, mode="drop")
        okr = keep & ~r_leaf
        upd2 = jnp.zeros(ni, jnp.int32)
        upd2 = upd2.at[jnp.where(okr, r_child, ni)].add(
            jnp.where(okr, r_pre, 0), mode="drop")
        msk2 = jnp.zeros(ni, bool)
        msk2 = msk2.at[jnp.where(okr, r_child, ni)].set(True, mode="drop")
        return jnp.where(msk, upd, jnp.where(msk2, upd2, pi))

    pre_i = jax.lax.fori_loop(0, MAX_DEPTH, pre_pass, pre_i)
    sl_ = jnp.where(l_leaf, 1, jnp.take(sizes, l_child))
    pre_l = pre_i + 1  # left child slot (leaf or internal)
    pre_r = pre_i + 1 + sl_

    return (order, first, last, split, l_leaf, r_leaf, keep, pre_i,
            pre_l, pre_r, node_lo, node_hi, lf_lo, lf_hi, rf_lo, rf_hi,
            axis_i, l_size, r_size)


def build_lbvh(
    prim_bmin,
    prim_bmax,
    prim_centers=None,
    max_leaf: int = 4,
) -> tuple[BVH, BVHBuildStatistics]:
    """Build a reference-layout linear BVH on device; host assembly is a
    handful of vectorized scatters."""
    t0 = time.perf_counter()
    prim_bmin = jnp.asarray(prim_bmin, jnp.float32)
    prim_bmax = jnp.asarray(prim_bmax, jnp.float32)
    if prim_centers is None:
        prim_centers = 0.5 * (prim_bmin + prim_bmax)
    prim_centers = jnp.asarray(prim_centers, jnp.float32)
    n = int(prim_bmin.shape[0])
    if n == 0:
        raise ValueError("no primitives")
    if n <= max_leaf:
        bvh = BVH(
            bmin=np.asarray(prim_bmin.min(axis=0))[None],
            bmax=np.asarray(prim_bmax.max(axis=0))[None],
            flag=np.ones(1, np.int32),
            axis=np.zeros(1, np.int32),
            data=np.asarray([[n, 0]], np.uint32),
            indices=np.arange(n, dtype=np.uint32),
        )
        return bvh, BVHBuildStatistics(0, 1, 0, time.perf_counter() - t0)

    out = _build_lbvh_jit(prim_bmin, prim_bmax, prim_centers, n, max_leaf)
    (order, first, last, split, l_leaf, r_leaf, keep, pre_i, pre_l, pre_r,
     node_lo, node_hi, lf_lo, lf_hi, rf_lo, rf_hi, axis_i, l_size, r_size
     ) = [np.asarray(x) for x in out]

    ki = np.nonzero(keep)[0]
    n_int = ki.shape[0]
    n_leaf = int((l_leaf & keep).sum() + (r_leaf & keep).sum())
    total = n_int + n_leaf

    bmin_o = np.zeros((total, 3), np.float32)
    bmax_o = np.zeros((total, 3), np.float32)
    flag_o = np.zeros(total, np.int32)
    axis_o = np.zeros(total, np.int32)
    data_o = np.zeros((total, 2), np.uint32)

    pi = pre_i[ki]
    bmin_o[pi] = node_lo[ki]
    bmax_o[pi] = node_hi[ki]
    axis_o[pi] = axis_i[ki]
    # child slots: left at pre_l, right at pre_r regardless of kind
    data_o[pi, 0] = pre_l[ki]
    data_o[pi, 1] = pre_r[ki]
    # left leaf children
    lm = np.nonzero(keep & l_leaf)[0]
    pl = pre_l[lm]
    bmin_o[pl] = lf_lo[lm]
    bmax_o[pl] = lf_hi[lm]
    flag_o[pl] = 1
    data_o[pl, 0] = l_size[lm]
    data_o[pl, 1] = first[lm]
    # right leaf children
    rm = np.nonzero(keep & r_leaf)[0]
    pr = pre_r[rm]
    bmin_o[pr] = rf_lo[rm]
    bmax_o[pr] = rf_hi[rm]
    flag_o[pr] = 1
    data_o[pr, 0] = r_size[rm]
    data_o[pr, 1] = split[rm] + 1

    bvh = BVH(bmin=bmin_o, bmax=bmax_o, flag=flag_o, axis=axis_o,
              data=data_o, indices=np.asarray(order, np.uint32))
    st = BVHBuildStatistics(
        num_leaf_nodes=n_leaf,
        num_branch_nodes=n_int,
        build_secs=time.perf_counter() - t0,
    )
    from ..core.bvh import stats_from_bvh

    st.max_tree_depth = stats_from_bvh(bvh).max_tree_depth
    return bvh, st
