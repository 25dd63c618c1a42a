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


@functools.partial(jax.jit, static_argnames=("n",))
def _karras_topology(codes, n: int):
    """(first, last, split) per internal node over sorted codes.

    Karras'12 formulated per-node galloping + two binary searches over
    pairwise common-prefix lengths (~150 scalar gathers of the code
    array at 10M tris — the build's second-largest cost). This uses the
    LCP composition property instead: with D[k] = delta(k, k+1) over
    ADJACENT sorted codes (one vectorized pass, no gathers),
    delta(a, b) == min D[a..b-1], so

      * the range end is a greedy aligned sparse-table descent — ONE
        table gather per bit of range length, and
      * the split is the LEFTMOST ARGMIN of D over the node range —
        one O(1) range-min query of a (value << 25 | index) key whose
        low bits carry the position.

    Duplicate codes keep Karras's index tie-break: D embeds
    32 + clz(k ^ (k+1)) exactly as the pairwise delta did, and the
    min-composition holds for the augmented keys because indices are
    strictly increasing. Results are identical to the reference
    formulation (nanort.h has no LBVH; this matches Karras directly).
    """
    i32 = jnp.int32
    m = n - 1
    if m >= (1 << 25):
        raise ValueError("argmin key packs indices into 25 bits")
    i = jnp.arange(m, dtype=i32)

    # adjacent deltas, slices only
    x = codes[:-1] ^ codes[1:]
    D = jnp.where(
        x == 0,
        32 + _clz32(i.astype(jnp.uint32) ^ (i + 1).astype(jnp.uint32)),
        _clz32(x),
    ).astype(i32)

    # per-level sparse min-tables over D, int8 (D <= 95), padded with -1
    # so out-of-range windows FAIL the `> dmin` test. Levels stay
    # separate arrays: every descent iteration uses one STATIC level, so
    # no flattened copy is ever materialized (~1 GB saved at 10M tris).
    n_lv = max(int(m).bit_length(), 1)
    levels = [D.astype(jnp.int8)]
    for k in range(1, n_lv):
        s = 1 << (k - 1)
        t = levels[-1]
        ext = jnp.full_like(t, np.int8(-1))
        if s < m:
            ext = ext.at[: m - s].set(t[s:])
        levels.append(jnp.minimum(t, ext))

    dp1 = D  # delta(i, i+1)
    dm1 = jnp.where(i > 0, jnp.concatenate([D[:1], D[:-1]]), -1)
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
