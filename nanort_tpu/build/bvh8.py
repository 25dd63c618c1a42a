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

import jax
import numpy as np

from ..core.bvh import BVH

MAX_LEAF_TRIS = 10
EMPTY_BIG = 3.0e38


@dataclasses.dataclass
class BVH8Scene:
    """Pytree: array tables are children, sizes are static aux data (so
    jitted callers can use them as shape/unroll parameters even when the
    scene itself is a traced argument)."""

    nodes: np.ndarray  # (N8+1, 128) f32 (includes the dummy park row)
    leafs: np.ndarray  # (M, 128) f32
    num_nodes: int
    num_leaf_rows: int
    depth: int  # BVH8 tree depth (stack sizing)
    max_leaf: int  # max triangles in any leaf row (kernel unroll bound)
    # optional Woop unit-triangle leaf table (build_woop_leafs): per-tri
    # affine transforms for the turbo intersector (intersector="woop")
    leafs_woop: np.ndarray | None = None

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)


jax.tree_util.register_pytree_node(
    BVH8Scene,
    lambda s: (
        (s.nodes, s.leafs, s.leafs_woop),
        (s.num_nodes, s.num_leaf_rows, s.depth, s.max_leaf),
    ),
    lambda aux, ch: BVH8Scene(ch[0], ch[1], *aux, leafs_woop=ch[2]),
)


def _surface_area(bmin, bmax):
    d = np.maximum(bmax - bmin, 0.0)
    return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])


def _leaf_scatter_index(offsets, counts):
    """Vectorized (row, slot, tri) index triplets for packing leaf rows
    (a Python loop over ~1M-triangle tables costs tens of seconds).

    ``l_idx`` is None when the leaf [offset, offset+count) ranges tile
    the index array contiguously in order (the preorder invariant every
    builder here maintains) — then tri ``k`` of the packed stream IS
    leaf-stream element ``k`` and callers skip a 9-wide gather that
    costs seconds on this host. int32 throughout: the int64 broadcast
    forms measured ~10 s at 1M tris on the throttled vCPU."""
    counts = counts.astype(np.int32)
    offsets = offsets.astype(np.int32)
    total = int(counts.sum())
    row_idx = np.repeat(
        np.arange(counts.shape[0], dtype=np.int32), counts
    )
    starts = np.zeros(counts.shape[0], np.int32)
    np.cumsum(counts[:-1], out=starts[1:])
    within = np.arange(total, dtype=np.int32) - np.repeat(starts, counts)
    if offsets.shape[0] == 0 or (
        offsets[0] == 0 and np.array_equal(offsets, starts)
    ):
        return row_idx, within, None
    l_idx = np.repeat(offsets, counts) + within
    return row_idx, within, l_idx


def collapse_bvh8(bvh: BVH, vertices, faces) -> BVH8Scene:
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces)
    bmin = np.asarray(bvh.bmin, np.float32)
    bmax = np.asarray(bvh.bmax, np.float32)
    flag = np.asarray(bvh.flag)
    data = np.asarray(bvh.data).astype(np.int64)
    indices = np.asarray(bvh.indices).astype(np.int64)

    # ---- leaf table: one row per binary leaf ----
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
    leaf_row_of = np.full(flag.shape[0], -1, np.int64)
    leaf_row_of[leaf_ids] = np.arange(leaf_ids.shape[0])
    m = leaf_ids.shape[0]
    leafs = np.zeros((max(m, 1), 128), np.float32)
    tri_all = vertices[faces[indices]].reshape(-1, 9)  # leaf-ordered
    pid_all = indices.astype(np.int32)
    row_idx, within, l_idx = _leaf_scatter_index(
        data[leaf_ids, 1], counts
    )
    # 1-D flat-index scatter: the 2-D broadcasted fancy-index form costs
    # ~14 s at 1M tris (numpy walks the index product elementwise)
    base9 = row_idx * np.int32(128) + np.int32(9) * within
    flat9 = (base9[:, None] + np.arange(9, dtype=np.int32)).reshape(-1)
    tvals = tri_all if l_idx is None else tri_all[l_idx]
    pvals = pid_all if l_idx is None else pid_all[l_idx]
    leafs.reshape(-1)[flat9] = tvals.reshape(-1)
    leafs.reshape(-1)[row_idx * np.int32(128) + np.int32(90) + within] = (
        pvals.astype(np.float32)
    )

    # ---- node collapse (vectorized, level-synchronous BFS) ----
    # The serial preorder emitter cost ~300 s of host Python at 10M tris;
    # this version expands the greedy 8-wide cuts of a whole BFS level at
    # once with (N, 8) numpy ops. Row order is BFS (root stays row 0);
    # nothing downstream relies on preorder — children are addressed by
    # explicit meta lanes.
    def cut8_batch(roots):
        """Greedy cuts of up to 8 binary descendants for every root at
        once: repeatedly split the largest-surface-area internal cut
        member (same pick order as the reference-style serial cut; ties
        resolve to the lowest slot, matching first-strict-max)."""
        n = roots.shape[0]
        ids = np.full((n, 8), 0, np.int64)
        ids[:, 0] = data[roots, 0]
        ids[:, 1] = data[roots, 1]
        cnt = np.full(n, 2, np.int64)
        rng_n = np.arange(n)
        slot = np.arange(8)[None, :]
        for _ in range(6):  # 2 -> 8 members, +1 per expansion
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
            can = (sa[rng_n, j] >= 0.0) & (cnt < 8)
            c = ids[rng_n, j]
            ids[can, j[can]] = data[c[can], 0]
            ids[can, cnt[can]] = data[c[can], 1]
            cnt[can] += 1
        return ids, cnt

    if flag[0] == 1:
        # degenerate single-leaf tree: one node with one leaf child
        nodes = np.zeros((2, 128), np.float32)
        for r in range(2):
            nodes[r, 0:64:8] = EMPTY_BIG
            nodes[r, 1:64:8] = EMPTY_BIG
            nodes[r, 2:64:8] = EMPTY_BIG
            nodes[r, 3:64:8] = -EMPTY_BIG
            nodes[r, 4:64:8] = -EMPTY_BIG
            nodes[r, 5:64:8] = -EMPTY_BIG
        nodes[0, 0:3] = bmin[0]
        nodes[0, 3:6] = bmax[0]
        nodes[0, 64] = np.float32(-(leaf_row_of[0] + 1))
        nodes[0, 72] = np.float32(data[0, 0])
        max_depth = 0
    else:
        level_rows: list[np.ndarray] = []
        frontier = np.zeros(1, np.int64)  # binary roots of this level
        row_base = 0
        max_depth = 0
        while frontier.size:
            n = frontier.shape[0]
            ids, cnt = cut8_batch(frontier)
            valid = np.arange(8)[None, :] < cnt[:, None]
            child_leaf = valid & (flag[ids] == 1)
            child_int = valid & ~child_leaf

            # near-first child order along the widest-centroid axis
            cent = 0.5 * (bmin[ids] + bmax[ids])  # (n, 8, 3)
            c_lo = np.where(valid[..., None], cent, np.inf).min(axis=1)
            c_hi = np.where(valid[..., None], cent, -np.inf).max(axis=1)
            axis = np.argmax(c_hi - c_lo, axis=1)  # (n,)
            key = np.where(
                valid, cent[np.arange(n)[:, None], np.arange(8)[None, :],
                            axis[:, None]], np.inf
            )
            order = np.argsort(key, axis=1, kind="stable")
            take = np.arange(n)[:, None]
            ids = ids[take, order]
            valid = valid[take, order]
            child_leaf = child_leaf[take, order]
            child_int = child_int[take, order]

            rows = np.zeros((n, 128), np.float32)
            rows[:, 0:64:8] = EMPTY_BIG
            rows[:, 1:64:8] = EMPTY_BIG
            rows[:, 2:64:8] = EMPTY_BIG
            rows[:, 3:64:8] = -EMPTY_BIG
            rows[:, 4:64:8] = -EMPTY_BIG
            rows[:, 5:64:8] = -EMPTY_BIG
            for c in range(8):
                v = valid[:, c]
                rows[v, 8 * c : 8 * c + 3] = bmin[ids[v, c]]
                rows[v, 8 * c + 3 : 8 * c + 6] = bmax[ids[v, c]]
            rows[:, 80] = axis.astype(np.float32)
            # leaf children: -(leaf_row+1) meta + tri count
            lr = np.where(child_leaf, leaf_row_of[ids], 0)
            lc = np.where(child_leaf, data[ids.clip(0), 0], 0)
            meta = np.where(child_leaf, -(lr + 1).astype(np.float64), 0.0)
            # internal children: next level's BFS row ids in row-major
            # order over this level's (node, slot) grid
            next_base = row_base + n
            int_rank = (np.cumsum(child_int.reshape(-1)) - 1).reshape(n, 8)
            meta = np.where(child_int, next_base + int_rank, meta)
            for c in range(8):
                rows[:, 64 + c] = np.where(
                    valid[:, c], meta[:, c], 0.0
                ).astype(np.float32)
                rows[:, 72 + c] = np.where(
                    child_leaf[:, c], lc[:, c], 0.0
                ).astype(np.float32)
            level_rows.append(rows)
            frontier = ids[child_int]
            row_base = next_base
            if frontier.size:
                max_depth += 1
        bfs = np.concatenate(level_rows)
        total = bfs.shape[0]
        # ---- reorder BFS rows into DFS preorder (vectorized) ----
        # Preorder costs ~5% traversal throughput when skipped
        # (measured 456 vs 434 ms on the 1M bench): near-first pops
        # then touch adjacent VMEM rows. Children are always at later
        # BFS levels, so subtree sizes accumulate bottom-up per level
        # and preorder offsets distribute top-down per level.
        starts = np.cumsum([0] + [r.shape[0] for r in level_rows])
        metas = bfs[:, 64:72].astype(np.int64)
        valid_l = bfs[:, 0:64:8] < EMPTY_BIG
        is_int = valid_l & (metas >= 0)
        child = np.where(is_int, metas, 0)
        sizes = np.ones(total, np.int64)
        for li in range(len(level_rows) - 1, -1, -1):
            a, b = starts[li], starts[li + 1]
            sizes[a:b] += np.where(
                is_int[a:b], sizes[child[a:b]], 0
            ).sum(axis=1)
        perm = np.zeros(total, np.int64)  # BFS idx -> preorder idx
        for li in range(len(level_rows) - 1):
            a, b = starts[li], starts[li + 1]
            csz = np.where(is_int[a:b], sizes[child[a:b]], 0)
            prefix = np.cumsum(csz, axis=1) - csz  # exclusive, slot order
            off = perm[a:b, None] + 1 + prefix
            perm[child[a:b][is_int[a:b]]] = off[is_int[a:b]]
        nodes = np.zeros((total + 1, 128), np.float32)
        nodes[perm] = bfs
        # remap internal metas through the permutation
        for c in range(8):
            lane = nodes[:, 64 + c].astype(np.int64)
            vi = (nodes[:, 8 * c] < EMPTY_BIG) & (lane >= 0)
            nodes[vi, 64 + c] = perm[lane[vi]].astype(np.float32)
        # dummy park row at index num_nodes: the packet kernel's
        # software-pipelined loop parks on it (empty boxes never hit)
        nodes[-1, 0:64:8] = EMPTY_BIG
        nodes[-1, 1:64:8] = EMPTY_BIG
        nodes[-1, 2:64:8] = EMPTY_BIG
        nodes[-1, 3:64:8] = -EMPTY_BIG
        nodes[-1, 4:64:8] = -EMPTY_BIG
        nodes[-1, 5:64:8] = -EMPTY_BIG
    return BVH8Scene(
        nodes=nodes,
        leafs=leafs,
        num_nodes=nodes.shape[0] - 1,  # excludes the dummy row
        num_leaf_rows=m,
        depth=max_depth + 1,
        max_leaf=int(counts.max(initial=1)),
    )


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
    tri = vertices[faces[indices]]  # (L, 3, 3) leaf-ordered, f64
    p0 = tri[:, 0]
    e1 = tri[:, 1] - p0
    e2 = tri[:, 2] - p0
    n = np.cross(e1, e2)
    # closed-form inverse of E = [e1 e2 n] (columns) via the adjugate:
    # np.linalg.inv on (L, 3, 3) runs a per-matrix LAPACK solve (~45 s
    # at 1M tris on this host); the vectorized cofactor form is ~30
    # flops/tri. Rows of E^-1 are the cross products of the other two
    # columns over det, det = e1 . (e2 x n) = n . n.
    det = np.einsum("ij,ij->i", n, n)
    ok = det > 0.0
    safe = np.where(ok, det, 1.0)[:, None]
    M = np.stack(
        [
            np.cross(e2, n) / safe,
            np.cross(n, e1) / safe,
            n / safe,
        ],
        axis=1,
    )  # (L, 3, 3): row i = i-th row of E^-1
    M = np.where(ok[:, None, None], M, 0.0)
    pid_all = indices.astype(np.int32)

    m = leaf_ids.shape[0]
    rows = np.zeros((max(m, 1), 128), np.float32)
    flat = np.concatenate(
        [M.reshape(-1, 9), p0], axis=1
    ).astype(np.float32)  # (L, 12)
    row_idx, within, l_idx = _leaf_scatter_index(
        data[leaf_ids, 1], counts
    )
    base12 = row_idx * np.int32(128) + np.int32(12) * within
    flat12 = (base12[:, None] + np.arange(12, dtype=np.int32)).reshape(-1)
    fvals = flat if l_idx is None else flat[l_idx]
    pvals = pid_all if l_idx is None else pid_all[l_idx]
    rows.reshape(-1)[flat12] = fvals.reshape(-1)
    rows.reshape(-1)[row_idx * np.int32(128) + np.int32(108) + within] = (
        pvals.astype(np.float32)
    )
    return rows
