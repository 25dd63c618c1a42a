"""BVH8: 8-wide collapse of the binary BVH for the Pallas packet kernel.

One BVH8 node occupies exactly one (1, 128)-lane float32 row — the natural
unit of a TPU VMEM fetch — so the packet traversal kernel pays a single
sublane-dynamic row read per step instead of 2-3 dependent pointer chases
(dynamic *lane* slicing is illegal on TPU: indices in the last dim must be
128-aligned, so the row IS the node):

  lanes [8c, 8c+6):   child c AABB (bmin.xyz, bmax.xyz), c in 0..7
  lane  64 + c:       child c meta, stored as an exact float integer
                      (scalar extraction of a float lane is a cheap SMEM
                      load; a bitcast int lane would force a vector
                      register -> scalar sync per extract):
                        >= 0  -> internal: BVH8 row index of the child
                        <  0  -> leaf: -(leaf_row + 1) into the leaf table
  lane  72 + c:       child c leaf triangle count (0 for internal/empty)
  lane  80:           traversal-order axis (0/1/2): children are stored
                      sorted near-to-far along this axis so the kernel can
                      pick a near-first pop order from the packet's ray
                      direction sign (the reference's per-node axis order,
                      nanort.h:2507-2515, packet-granular here)
  float-int encoding is exact to 2^24: scenes are capped at 16.7M
  primitives per BVH8 (the binary BVH keeps the reference's 2G cap)
  empty slots carry an inverted box (never hit) and count 0.

Leaf table rows pack up to 10 triangles (one binary-BVH leaf each):

  lanes [9t, 9t+9):   triangle t vertices (p0, p1, p2 xyz)
  lane  90 + t:       triangle t original prim id (exact float integer)

The collapse walks the binary tree (build.sah output, reference layout
nanort.h:1759-1890) and repeatedly expands the largest-surface-area member
of the cut until 8 slots fill — the standard greedy BVH2->BVH8 conversion.
Requires the binary build to use ``max_leaf_primitives <= 10``.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np

from ..core.bvh import BVH

MAX_LEAF_TRIS = 10
EMPTY_BIG = 3.0e38


@dataclasses.dataclass
class BVH8Scene:
    """Pytree: array tables are children, sizes are static aux data (so
    jitted callers can use them as shape/unroll parameters even when the
    scene itself is a traced argument).

    ``width`` is the node fan-out: 8 (two f32 rows per node, 86/128
    lanes live) or 16 (ONE dense f32 row per node, ``collapse_bvh16``)
    — the packet kernel fetches one (NR, 128) block per node pop."""

    nodes: np.ndarray  # (N+1 rows [*2 if unpacked16], 128) f32 (+ dummy)
    leafs: np.ndarray  # (M, 128) f32
    num_nodes: int
    num_leaf_rows: int
    depth: int  # BVH8 tree depth (stack sizing)
    max_leaf: int  # max triangles in any leaf row (kernel unroll bound)
    # optional Woop unit-triangle leaf table (build_woop_leafs): per-tri
    # affine transforms for the turbo intersector (intersector="woop")
    leafs_woop: np.ndarray | None = None
    width: int = 8

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)


jax.tree_util.register_pytree_node(
    BVH8Scene,
    lambda s: (
        (s.nodes, s.leafs, s.leafs_woop),
        (s.num_nodes, s.num_leaf_rows, s.depth, s.max_leaf, s.width),
    ),
    lambda aux, ch: BVH8Scene(
        ch[0], ch[1], *aux[:4], leafs_woop=ch[2], width=aux[4]
    ),
)


def _surface_area(bmin, bmax):
    d = np.maximum(bmax - bmin, 0.0)
    return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])


def _fill_leaf_rows(rows, offsets, counts, vals, stride, lane0,
                    pid_vals=None, pid_lane=0):
    """Pack per-triangle ``vals`` (L, stride) into leaf rows at
    ``lane0 + stride*slot`` (+ pids at ``pid_lane + slot``), WITHOUT
    materializing a flat scatter-index array: the (L, 1) + (stride,)
    index broadcast alone cost ~8 s at 2M tris on this throttled vCPU.

    Fast paths (in order): uniform counts over a contiguous leaf stream
    -> two strided block copies; otherwise grouped-by-count flat gathers
    (<= 10 groups)."""
    counts = counts.astype(np.int64)
    offsets = offsets.astype(np.int64)
    m = counts.shape[0]
    starts = np.zeros(m, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    contiguous = m == 0 or (
        offsets[0] == 0 and np.array_equal(offsets, starts)
    )
    if not contiguous:
        # non-preorder builders: reorder the value stream leaf-first
        l_idx = np.repeat(offsets, counts) + (
            np.arange(int(counts.sum()), dtype=np.int64)
            - np.repeat(starts, counts)
        )
        vals = vals[l_idx]
        if pid_vals is not None:
            pid_vals = pid_vals[l_idx]
    if m and counts.min() == counts.max():
        c = int(counts[0])
        rows[:, lane0 : lane0 + stride * c] = vals.reshape(m, stride * c)
        if pid_vals is not None:
            rows[:, pid_lane : pid_lane + c] = pid_vals.reshape(m, c)
        return
    flat = vals.reshape(-1)
    rflat = rows.reshape(-1)
    lanes = rows.shape[1]
    for c in np.unique(counts):
        c = int(c)
        if c == 0:
            continue
        sel = np.nonzero(counts == c)[0]
        seg = starts[sel]
        span = np.arange(stride * c, dtype=np.int64)
        src = flat[(seg[:, None] * stride + span).reshape(-1)]
        dst = ((sel * lanes + lane0)[:, None] + span).reshape(-1)
        rflat[dst] = src
        if pid_vals is not None:
            spanc = np.arange(c, dtype=np.int64)
            rflat[((sel * lanes + pid_lane)[:, None] + spanc).reshape(-1)] = (
                pid_vals[(seg[:, None] + spanc).reshape(-1)]
            )


def _fill_leaf_segments(rows, seg_row, seg_slot, seg_len, seg_src, vals,
                        stride, lane0, pid_lane, pid_vals):
    """Scatter destination segments (row, slot0, len, src-tri-offset)
    into packed leaf rows. Grouped by segment length (<= 10 groups);
    flat gathers/scatters only — no index-product materialization over
    the whole stream (that alone cost ~8 s at 2M tris on this vCPU).
    ``seg_src`` indexes the leaf-ordered triangle stream directly (the
    reference's index-array offsets, nanort.h data[1]), so no stream
    contiguity is assumed."""
    flat = vals.reshape(-1)
    rflat = rows.reshape(-1)
    for c in np.unique(seg_len) if seg_len.size else []:
        c = int(c)
        if c == 0:
            continue
        sel = np.nonzero(seg_len == c)[0]
        src0 = seg_src[sel]
        base = seg_row[sel] * 128 + lane0 + stride * seg_slot[sel]
        span = np.arange(stride * c, dtype=np.int64)
        src = flat[(src0[:, None] * stride + span).reshape(-1)]
        rflat[(base[:, None] + span).reshape(-1)] = src
        spanc = np.arange(c, dtype=np.int64)
        pbase = seg_row[sel] * 128 + pid_lane + seg_slot[sel]
        rflat[(pbase[:, None] + spanc).reshape(-1)] = pid_vals[
            (src0[:, None] + spanc).reshape(-1)
        ]


def _woop_transforms_from(vertices, faces, indices) -> np.ndarray:
    """Per-triangle Woop unit-triangle transforms for the leaf-ordered
    stream ``indices``: (L, 12) f32 rows of [M row-major | anchor p0]
    (see ``build_woop_leafs`` for the math and conditioning notes).
    Chunked with manual cross products: whole-array np.cross/np.stack
    allocate ~350 MB of f64 temporaries and first-touch page faults on
    this vCPU cost ~25 s / 2M tris."""
    vertices = np.asarray(vertices, np.float64)
    faces = np.asarray(faces)
    L = indices.shape[0]
    flat = np.empty((L, 12), np.float32)
    CHUNK = 1 << 18
    for a in range(0, L, CHUNK):
        b = min(a + CHUNK, L)
        tri = vertices[faces[indices[a:b]]]  # (c, 3, 3) f64
        p0 = tri[:, 0]
        e1 = tri[:, 1] - p0
        e2 = tri[:, 2] - p0

        def cross(x, y):
            return (
                x[:, 1] * y[:, 2] - x[:, 2] * y[:, 1],
                x[:, 2] * y[:, 0] - x[:, 0] * y[:, 2],
                x[:, 0] * y[:, 1] - x[:, 1] * y[:, 0],
            )

        nx, ny, nz = cross(e1, e2)
        det = nx * nx + ny * ny + nz * nz
        ok = det > 0.0
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        n3 = np.stack([nx, ny, nz], axis=1)
        r0 = cross(e2, n3)
        r1 = cross(n3, e1)
        for k in range(3):
            flat[a:b, k] = r0[k] * inv
            flat[a:b, 3 + k] = r1[k] * inv
            flat[a:b, 6 + k] = n3[:, k] * inv
            flat[a:b, 9 + k] = p0[:, k]
    return flat


def collapse_bvh8(
    bvh: BVH,
    vertices,
    faces,
    width: int = 8,
    merge_leafs: bool = True,
    woop: bool = False,
) -> BVH8Scene:
    """Collapse the binary BVH into width-wide packet-kernel tables.

    ``merge_leafs`` (default): adjacent small sibling leaves inside each
    node's cut are bin-packed into shared leaf rows (respecting the
    near-first child order). Binary SAH splitting leaves rows ~70% full
    on average (a range of 10 splits 5+5, not 9+1), so merging cuts both
    leaf-row count (~drain steps) and node count (~VMEM footprint: the
    10M-tri scene's nodes shrink from 260 MB — forced all-HBM mode — to
    under the VMEM budget) at the cost of nothing but equal-t tie order,
    which is unordered across engines anyway (CLAUDE.md invariants).

    ``woop=True`` also bakes the Woop unit-triangle table with the SAME
    row layout (merged rows make standalone ``build_woop_leafs``
    mismatched — it stays valid only for ``merge_leafs=False`` scenes).
    """
    if width not in (8, 16):
        raise ValueError(f"width must be 8 or 16: {width}")
    # 16-wide nodes use the DENSE single-row layout: 16 children in ONE
    # fully-occupied (1, 128) f32 row — child w's exact slab bounds
    # (lo.xyz, hi.xyz) at lanes [6w, 6w+6), metas at 96+w, leaf counts
    # at 112+w, and the near-first order axis folded into the child-0
    # count lane as cnt + 16*axis (every count consumer masks & 15).
    # One node pop = one dynamic row fetch = 16 slab tests per
    # vector->scalar sync at HALF the VMEM bytes per child of the 8-wide
    # layout (which occupies only 86 of 128 lanes).
    packed16 = width == 16
    import time as _time
    _prof = os.environ.get("NANORT_COLLAPSE_PROFILE") == "1"
    _t0 = _time.perf_counter()
    _marks: list[tuple[str, float]] = []

    def _mark(name):
        nonlocal _t0
        if _prof:
            now = _time.perf_counter()
            _marks.append((name, now - _t0))
            _t0 = now

    W = width
    NR = 1 if packed16 else W // 8  # rows per node
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces)
    bmin = np.asarray(bvh.bmin, np.float32)
    bmax = np.asarray(bvh.bmax, np.float32)
    flag = np.asarray(bvh.flag)
    data = np.asarray(bvh.data).astype(np.int64)
    indices = np.asarray(bvh.indices).astype(np.int64)

    if indices.shape[0] > (1 << 24):
        raise ValueError("BVH8 float-int lanes are exact to 2^24 prims")
    leaf_ids = np.nonzero(flag == 1)[0]
    counts = data[leaf_ids, 0]
    if counts.max(initial=0) > MAX_LEAF_TRIS:
        raise ValueError(
            f"binary leaves must hold <= {MAX_LEAF_TRIS} tris for BVH8 "
            f"packing (got {counts.max()}); build with "
            f"max_leaf_primitives<={MAX_LEAF_TRIS}"
        )
    cap = int(counts.max(initial=1)) if merge_leafs else 0
    if woop and cap > 9:
        raise ValueError("woop rows hold <= 9 tris; build with "
                         "max_leaf_primitives <= 9")

    # ---- node collapse (vectorized, level-synchronous BFS) ----
    # The serial preorder emitter cost ~300 s of host Python at 10M tris;
    # this version expands the greedy 8-wide cuts of a whole BFS level at
    # once with (N, 8) numpy ops. Row order is BFS (root stays row 0);
    # nothing downstream relies on preorder — children are addressed by
    # explicit meta lanes.
    def cut8_batch(roots):
        """Greedy cuts of up to W binary descendants for every root at
        once: repeatedly split the largest-surface-area internal cut
        member (same pick order as the reference-style serial cut; ties
        resolve to the lowest slot, matching first-strict-max)."""
        n = roots.shape[0]
        ids = np.full((n, W), 0, np.int64)
        ids[:, 0] = data[roots, 0]
        ids[:, 1] = data[roots, 1]
        cnt = np.full(n, 2, np.int64)
        rng_n = np.arange(n)
        slot = np.arange(W)[None, :]
        for _ in range(W - 2):  # 2 -> W members, +1 per expansion
            valid = slot < cnt[:, None]
            isint = valid & (flag[ids] == 0)
            d = np.maximum(bmax[ids] - bmin[ids], 0.0)
            sa = 2.0 * (
                d[..., 0] * d[..., 1]
                + d[..., 1] * d[..., 2]
                + d[..., 2] * d[..., 0]
            )
            sa = np.where(isint, sa, -1.0)
            j = np.argmax(sa, axis=1)
            can = (sa[rng_n, j] >= 0.0) & (cnt < W)
            c = ids[rng_n, j]
            ids[can, j[can]] = data[c[can], 0]
            ids[can, cnt[can]] = data[c[can], 1]
            cnt[can] += 1
        return ids, cnt

    def empty_rows(shape):
        r = np.zeros(shape, np.float32)
        if packed16:
            for ax in range(3):  # inverted box: lo > hi, never hits
                r[..., ax:96:6] = EMPTY_BIG
                r[..., 3 + ax:96:6] = -EMPTY_BIG
        else:
            r[..., 0:64:8] = EMPTY_BIG
            r[..., 1:64:8] = EMPTY_BIG
            r[..., 2:64:8] = EMPTY_BIG
            r[..., 3:64:8] = -EMPTY_BIG
            r[..., 4:64:8] = -EMPTY_BIG
            r[..., 5:64:8] = -EMPTY_BIG
        return r

    if flag[0] == 1:
        # degenerate single-leaf tree: one node with one leaf child
        nodes3 = empty_rows((2, NR, 128))
        if packed16:
            nodes3[0, 0, 0:3] = bmin[0]
            nodes3[0, 0, 3:6] = bmax[0]
            nodes3[0, 0, 96] = np.float32(-1.0)  # leaf row 0
            nodes3[0, 0, 112] = np.float32(data[0, 0])  # axis 0
        else:
            nodes3[0, 0, 0:3] = bmin[0]
            nodes3[0, 0, 3:6] = bmax[0]
            nodes3[0, 0, 64] = np.float32(-1.0)  # leaf row 0
            nodes3[0, 0, 72] = np.float32(data[0, 0])
        nodes = nodes3.reshape(-1, 128)
        seg_rows_l = [np.zeros(1, np.int64)]
        seg_slot_l = [np.zeros(1, np.int64)]
        seg_len_l = [np.asarray([data[0, 0]], np.int64)]
        seg_src_l = [np.asarray([data[0, 1]], np.int64)]
        seg_leaf_l = [np.zeros(1, np.int64)]
        m_rows = 1
        total = 1
        max_depth = 0
        max_leaf_out = int(data[0, 0])
    else:
        level_rows: list[np.ndarray] = []
        level_meta: list[np.ndarray] = []  # (n, W) int64 node-id metas
        level_isint: list[np.ndarray] = []
        # per-binary-leaf destination segments (a leaf's triangles may
        # split across two packed rows): row, slot0, len, src offset
        seg_rows_l, seg_slot_l, seg_len_l, seg_src_l, seg_leaf_l = (
            [], [], [], [], []
        )
        frontier = np.zeros(1, np.int64)  # binary roots of this level
        node_base = 0
        leaf_row_base = 0
        max_depth = 0
        max_leaf_out = 1
        rngW = np.arange(W)[None, :]
        _cut_s = 0.0
        while frontier.size:
            n = frontier.shape[0]
            _tc = _time.perf_counter() if _prof else 0.0
            ids, cnt = cut8_batch(frontier)
            if _prof:
                _cut_s += _time.perf_counter() - _tc
            valid = rngW < cnt[:, None]
            child_leaf = valid & (flag[ids] == 1)
            child_int = valid & ~child_leaf

            # near-first child order along the widest-centroid axis
            cent = 0.5 * (bmin[ids] + bmax[ids])  # (n, W, 3)
            c_lo = np.where(valid[..., None], cent, np.inf).min(axis=1)
            c_hi = np.where(valid[..., None], cent, -np.inf).max(axis=1)
            axis = np.argmax(c_hi - c_lo, axis=1)  # (n,)
            key = np.where(
                valid, cent[np.arange(n)[:, None], rngW, axis[:, None]],
                np.inf,
            )
            order = np.argsort(key, axis=1, kind="stable")
            take = np.arange(n)[:, None]
            ids = ids[take, order]
            valid = valid[take, order]
            child_leaf = child_leaf[take, order]
            child_int = child_int[take, order]

            # ---- leaf repacking: pool ADJACENT (near-first order) leaf
            # children into rows filled to ``cap`` triangles, splitting
            # a leaf's triangles across two rows when needed. Binary SAH
            # leaves average ~0.7*cap, so row-per-leaf wastes ~30% of
            # every drain step; triangle-level packing recovers it. ----
            lcnt = np.where(child_leaf, data[ids.clip(0), 0], 0)
            grp_start = np.zeros((n, W), bool)
            part_prev = np.zeros((n, W), np.int64)  # tris joining the
            part_rem = np.zeros((n, W), np.int64)   # open row / new row
            prev_run = np.zeros((n, W), np.int64)   # slot0 of the join
            run = np.zeros(n, np.int64)
            for w in range(W):
                isl = child_leaf[:, w]
                c = lcnt[:, w]
                if merge_leafs:
                    space = cap - run
                    join = isl & (run > 0) & (space > 0)
                    pp = np.where(join, np.minimum(c, space), 0)
                else:
                    pp = np.zeros(n, np.int64)
                rem = np.where(isl, c - pp, 0)
                part_prev[:, w] = pp
                prev_run[:, w] = run
                part_rem[:, w] = rem
                grp_start[:, w] = isl & (rem > 0)
                run = np.where(
                    isl, np.where(rem > 0, rem, run + pp), 0
                )
            # global row ids for this level's groups (row-major order)
            gflat = grp_start.reshape(-1)
            gid = np.cumsum(gflat).reshape(n, W) - 1 + leaf_row_base
            n_groups = int(gflat.sum())
            # resolve each member's open-row id (the last start <= w)
            segA_row = np.zeros((n, W), np.int64)
            segB_row = np.zeros((n, W), np.int64)
            cur_gid = np.zeros(n, np.int64)
            for w in range(W):
                segA_row[:, w] = cur_gid
                cur_gid = np.where(grp_start[:, w], gid[:, w], cur_gid)
                segB_row[:, w] = cur_gid
            # row totals + conservative row boxes from contributing
            # member leaf boxes, via reduceat over the (slot, A/B)
            # segment stream whose gid is non-decreasing
            mA = part_prev > 0
            mB = part_rem > 0
            seg_gid = np.concatenate(
                [segA_row[mA] - leaf_row_base, segB_row[mB] - leaf_row_base]
            )
            seg_cnt = np.concatenate([part_prev[mA], part_rem[mB]])
            seg_leaf = np.concatenate([ids[mA], ids[mB]])
            if n_groups:
                gtot_flat = np.bincount(
                    seg_gid, weights=seg_cnt, minlength=n_groups
                ).astype(np.int64)
                glo = np.full((n_groups, 3), np.inf, np.float32)
                ghi = np.full((n_groups, 3), -np.inf, np.float32)
                for ax in range(3):
                    np.minimum.at(glo[:, ax], seg_gid, bmin[seg_leaf, ax])
                    np.maximum.at(ghi[:, ax], seg_gid, bmax[seg_leaf, ax])
            else:
                gtot_flat = np.zeros(0, np.int64)
                glo = np.zeros((0, 3), np.float32)
                ghi = np.zeros((0, 3), np.float32)
            # record per-binary-leaf destination segments (<= 2 each)
            if mA.any():
                lids = ids[mA]
                seg_rows_l.append(segA_row[mA])
                seg_slot_l.append(prev_run[mA])
                seg_len_l.append(part_prev[mA])
                seg_src_l.append(data[lids, 1])
                seg_leaf_l.append(lids)
            if mB.any():
                lids = ids[mB]
                seg_rows_l.append(segB_row[mB])
                seg_slot_l.append(np.zeros(int(mB.sum()), np.int64))
                seg_len_l.append(part_rem[mB])
                seg_src_l.append(data[lids, 1] + part_prev[mB])
                seg_leaf_l.append(lids)
            leaf_row_base += n_groups
            if n_groups:
                max_leaf_out = max(max_leaf_out, int(gtot_flat.max()))
            gtot = np.zeros((n, W), np.int64)
            gmin = np.zeros((n, W, 3), np.float32)
            gmax = np.zeros((n, W, 3), np.float32)
            gs = grp_start
            gtot[gs] = gtot_flat[gid[gs] - leaf_row_base + n_groups]
            gmin[gs] = glo[gid[gs] - leaf_row_base + n_groups]
            gmax[gs] = ghi[gid[gs] - leaf_row_base + n_groups]
            grow = gid
            take = np.arange(n)[:, None]

            # ---- compact to the post-merge child set ----
            keep = (child_int | grp_start) & valid
            order2 = np.argsort(~keep, axis=1, kind="stable")
            ids = ids[take, order2]
            child_int = (child_int & keep)[take, order2]
            is_gleaf = grp_start[take, order2] & keep[take, order2]
            validk = keep[take, order2]
            blo = np.where(
                is_gleaf[..., None], gmin[take, order2],
                bmin[ids.clip(0)],
            )
            bhi = np.where(
                is_gleaf[..., None], gmax[take, order2],
                bmax[ids.clip(0)],
            )
            gcnt2 = gtot[take, order2]
            grow2 = grow[take, order2]

            rows = empty_rows((n, NR, 128))
            for w in range(W):
                if packed16:
                    r, b0 = 0, 6 * w
                else:
                    r, c = divmod(w, 8)
                    b0 = 8 * c
                v = validk[:, w]
                rows[v, r, b0 : b0 + 3] = blo[v, w]
                rows[v, r, b0 + 3 : b0 + 6] = bhi[v, w]
            meta = np.where(is_gleaf, -(grow2 + 1), 0)
            # internal children: next level's BFS NODE ids in row-major
            # order over this level's (node, slot) grid
            next_base = node_base + n
            int_rank = (np.cumsum(child_int.reshape(-1)) - 1).reshape(n, W)
            meta = np.where(child_int, next_base + int_rank, meta)
            for w in range(W):
                if packed16:
                    r, mlane, clane = 0, 96 + w, 112 + w
                else:
                    r, c = divmod(w, 8)
                    mlane, clane = 64 + c, 72 + c
                rows[:, r, mlane] = np.where(
                    validk[:, w], meta[:, w], 0.0
                ).astype(np.float32)
                rows[:, r, clane] = np.where(
                    is_gleaf[:, w], gcnt2[:, w], 0.0
                ).astype(np.float32)
            if packed16:
                # order axis rides the child-0 count lane (cnt + 16*axis;
                # every count consumer masks & 15)
                rows[:, 0, 112] += 16.0 * axis.astype(np.float32)
            else:
                rows[:, 0, 80] = axis.astype(np.float32)
            level_rows.append(rows)
            level_meta.append(meta.astype(np.int64))
            level_isint.append(child_int)
            frontier = ids[child_int]
            node_base = next_base
            if frontier.size:
                max_depth += 1
        m_rows = leaf_row_base
        _mark("level_loop")
        if _prof:
            _marks.append(("  cut8_of_level_loop", _cut_s))
        bfs = np.concatenate(level_rows)  # (total, NR, 128)
        total = bfs.shape[0]
        # ---- reorder BFS nodes into DFS preorder (vectorized) ----
        # Preorder costs ~5% traversal throughput when skipped
        # (measured 456 vs 434 ms on the 1M bench): near-first pops
        # then touch adjacent VMEM rows. Children are always at later
        # BFS levels, so subtree sizes accumulate bottom-up per level
        # and preorder offsets distribute top-down per level.
        starts = np.cumsum([0] + [r.shape[0] for r in level_rows])
        metas = np.concatenate(level_meta)  # (total, W)
        is_int = np.concatenate(level_isint)
        child = np.where(is_int, metas, 0)
        sizes = np.ones(total, np.int64)
        for li in range(len(level_rows) - 1, -1, -1):
            a, b = starts[li], starts[li + 1]
            sizes[a:b] += np.where(
                is_int[a:b], sizes[child[a:b]], 0
            ).sum(axis=1)
        perm = np.zeros(total, np.int64)  # BFS node id -> preorder id
        for li in range(len(level_rows) - 1):
            a, b = starts[li], starts[li + 1]
            csz = np.where(is_int[a:b], sizes[child[a:b]], 0)
            prefix = np.cumsum(csz, axis=1) - csz  # exclusive, slot order
            off = perm[a:b, None] + 1 + prefix
            perm[child[a:b][is_int[a:b]]] = off[is_int[a:b]]
        nodes3 = np.zeros((total + 1, NR, 128), np.float32)
        nodes3[perm] = bfs
        # remap internal metas through the permutation; empty slots are
        # recognized by their inverted (never-hit) box, not the meta lane
        for w in range(W):
            if packed16:
                r, mlane = 0, 96 + w
                occupied = nodes3[:, 0, 6 * w] < EMPTY_BIG
            else:
                r, c = divmod(w, 8)
                mlane = 64 + c
                occupied = nodes3[:, r, 8 * c] < EMPTY_BIG
            lane = nodes3[:, r, mlane].astype(np.int64)
            vi = occupied & (lane >= 0)
            nodes3[vi, r, mlane] = perm[lane[vi]].astype(np.float32)
        # dummy park node at id num_nodes: the packet kernel's
        # software-pipelined loop parks on it (empty boxes never hit)
        nodes3[-1] = empty_rows((NR, 128))
        nodes = nodes3.reshape(-1, 128)
        _mark("preorder_permute")

    # ---- leaf table: fill packed rows from destination segments ----
    seg_row = np.concatenate(seg_rows_l) if seg_rows_l else np.zeros(0, np.int64)
    seg_slot = np.concatenate(seg_slot_l) if seg_slot_l else np.zeros(0, np.int64)
    seg_len = np.concatenate(seg_len_l) if seg_len_l else np.zeros(0, np.int64)
    seg_src = np.concatenate(seg_src_l) if seg_src_l else np.zeros(0, np.int64)
    leafs = np.zeros((max(m_rows, 1), 128), np.float32)
    tri_all = vertices[faces[indices]].reshape(-1, 9)  # leaf-ordered
    pid_all = indices.astype(np.int32).astype(np.float32)
    _mark("tri_gather")
    _fill_leaf_segments(
        leafs, seg_row, seg_slot, seg_len, seg_src, tri_all, 9, 0, 90,
        pid_all,
    )
    _mark("wt_fill")
    leafs_woop = None
    if woop:
        leafs_woop = np.zeros((max(m_rows, 1), 128), np.float32)
        wflat = _woop_transforms_from(vertices, faces, indices)
        _mark("woop_transforms")
        _fill_leaf_segments(
            leafs_woop, seg_row, seg_slot, seg_len, seg_src, wflat, 12,
            0, 108, pid_all,
        )
        _mark("woop_fill")
    if _prof:
        print("# collapse_bvh8 profile: "
              + " ".join(f"{k}={v:.1f}s" for k, v in _marks), flush=True)
    return BVH8Scene(
        nodes=nodes,
        leafs=leafs,
        num_nodes=total,  # logical nodes, excludes the dummy
        num_leaf_rows=m_rows,
        depth=max_depth + 1,
        max_leaf=max_leaf_out,
        leafs_woop=leafs_woop,
        width=W,
    )


def collapse_bvh16(bvh: BVH, vertices, faces, **kw) -> BVH8Scene:
    """16-wide collapse in the DENSE single-row node layout: 16 children
    in ONE fully-occupied (1, 128) f32 row — child w's exact slab
    bounds at lanes [6w, 6w+6), metas at 96+w, leaf counts at 112+w,
    near-first order axis folded into the child-0 count lane as
    cnt + 16*axis (count consumers mask & 15). One node pop = ONE
    (1, 128) dynamic fetch = 16 slab tests per vector->scalar sync
    (double BVH8's rate, without adding in-flight dynamic fetches — 3+
    of those fault the v5e backend; see pallas_packet.py's pop_n clamp)
    at HALF the VMEM bytes per child of the 8-wide layout, which
    occupies only 86 of 128 lanes."""
    return collapse_bvh8(bvh, vertices, faces, width=16, **kw)


def build_woop_leafs(bvh: BVH, vertices, faces) -> np.ndarray:
    """Woop unit-triangle leaf table for the turbo intersector.

    Each triangle is baked as the affine transform into its own "unit
    triangle" space (Woop et al. 2004): columns of E = [e1, e2, n] with
    e1 = p1-p0, e2 = p2-p0, n = e1 x e2, stored as M = E^-1 plus the
    anchor vertex p0, so in-kernel o' = M (o - p0) and d' = M d give
    t = -o'z / d'z, u = o'x + t d'x, v = o'y + t d'y with the plain
    unit-triangle test u >= 0, v >= 0, u+v <= 1.

    Storing p0 (translate-then-rotate) rather than the fused offset
    b = -M p0 costs three subtractions per triangle test but keeps the
    origin-relative coordinates well-conditioned: with the fused form,
    scenes far from the world origin lose most of their f32 mantissa to
    the M o / b cancellation, which is exactly where the turbo t values
    were drifting >4 ulp from the watertight intersector.

    One (1, 128) row per binary leaf, same row order as ``collapse_bvh8``
    (the kernel's leaf queue indexes both tables identically):

      lanes [12t, 12t+9):      triangle t transform M, row-major
      lanes [12t+9, 12t+12):   triangle t anchor vertex p0
      lane  108 + t:           triangle t original prim id (exact float)

    12 lanes/tri + the pid block at lane 108 cap rows at 9 triangles —
    build with ``max_leaf_primitives <= 9`` (9-tri leaves trade ~11%
    fewer drain steps against slightly larger leaf unions). Degenerate (zero-area) triangles get a
    zero matrix: d'z = 0 everywhere, so they never report a hit (the
    watertight path rejects them via det == 0 the same way).

    This intersector trades the reference's watertight guarantees
    (nanort.h:993-1229) for ~40% fewer leaf-phase ops: results stay
    within a few ulps on well-conditioned triangles, but edge-crossing
    rays may pick the neighbouring triangle (equal-t) or, rarely, slip
    through a shared edge. Use the default watertight intersector when
    bit-parity with the reference matters.

    NOTE: rows here map 1:1 to binary leaves — only valid for scenes
    collapsed with ``merge_leafs=False``. Merged scenes must bake the
    woop table inside the collapse (``collapse_bvh8(..., woop=True)``)
    so both tables share the merged row layout.
    """
    vertices = np.asarray(vertices, np.float64)
    faces = np.asarray(faces)
    flag = np.asarray(bvh.flag)
    data = np.asarray(bvh.data).astype(np.int64)
    indices = np.asarray(bvh.indices).astype(np.int64)

    leaf_ids = np.nonzero(flag == 1)[0]
    counts = data[leaf_ids, 0]
    if counts.max(initial=0) > 9:
        raise ValueError(
            "woop leaf rows hold <= 9 triangles (12 lanes each + pid "
            f"block at lane 108); build with max_leaf_primitives<=9 "
            f"(got {counts.max()})"
        )
    flat = _woop_transforms_from(vertices, faces, indices)
    pid_all = indices.astype(np.int32)

    m = leaf_ids.shape[0]
    rows = np.zeros((max(m, 1), 128), np.float32)
    _fill_leaf_rows(
        rows, data[leaf_ids, 1], counts, flat, 12, 0,
        pid_vals=pid_all.astype(np.float32), pid_lane=108,
    )
    return rows
