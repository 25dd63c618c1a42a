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
    (a Python loop over ~1M-triangle tables costs tens of seconds)."""
    counts = counts.astype(np.int64)
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
    starts = np.zeros(counts.shape[0], np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    l_idx = np.repeat(offsets.astype(np.int64), counts) + within
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
    leafs[row_idx[:, None], 9 * within[:, None] + np.arange(9)] = (
        tri_all[l_idx]
    )
    leafs[row_idx, 90 + within] = pid_all[l_idx].astype(np.float32)

    # ---- node collapse ----
    def cut8(root: int):
        """Greedy cut of up to 8 binary descendants under `root`."""
        if flag[root] == 1:
            return [root]
        cut = [int(data[root, 0]), int(data[root, 1])]
        while len(cut) < 8:
            best, best_sa = -1, -1.0
            for j, c in enumerate(cut):
                if flag[c] == 0:
                    sa = _surface_area(bmin[c], bmax[c])
                    if sa > best_sa:
                        best, best_sa = j, sa
            if best < 0:
                break
            c = cut.pop(best)
            cut.extend((int(data[c, 0]), int(data[c, 1])))
        return cut

    rows: list[np.ndarray] = []
    max_depth = 0
    # preorder emission with parent patch: (binary root, parent row, slot, depth)
    stack = [(0, -1, 0, 0)]
    while stack:
        broot, parent, slot, depth = stack.pop()
        max_depth = max(max_depth, depth)
        my = len(rows)
        row = np.zeros(128, np.float32)
        row[0:64:8] = EMPTY_BIG  # empty-slot bmin.x
        row[1:64:8] = EMPTY_BIG
        row[2:64:8] = EMPTY_BIG
        row[3:64:8] = -EMPTY_BIG
        row[4:64:8] = -EMPTY_BIG
        row[5:64:8] = -EMPTY_BIG
        rows.append(row)
        if parent >= 0:
            rows[parent][64 + slot] = np.float32(my)
        children = cut8(broot)
        if len(children) > 1:
            cent = 0.5 * (bmin[children] + bmax[children])
            axis = int(np.argmax(cent.max(0) - cent.min(0)))
            children = [children[i] for i in
                        np.argsort(cent[:, axis], kind="stable")]
            row[80] = np.float32(axis)
        for c, b in enumerate(children):
            row[8 * c : 8 * c + 3] = bmin[b]
            row[8 * c + 3 : 8 * c + 6] = bmax[b]
            if flag[b] == 1:
                lr = leaf_row_of[b]
                row[64 + c] = np.float32(-(lr + 1))
                row[72 + c] = np.float32(data[b, 0])
            else:
                # placeholder patched when the child row is emitted
                stack.append((b, my, c, depth + 1))

    rows.append(rows[0] * 0.0)  # dummy row at index num_nodes: the packet
    # kernel's software-pipelined loop parks on it (empty boxes never hit)
    dummy = rows[-1]
    dummy[0:64:8] = EMPTY_BIG
    dummy[1:64:8] = EMPTY_BIG
    dummy[2:64:8] = EMPTY_BIG
    dummy[3:64:8] = -EMPTY_BIG
    dummy[4:64:8] = -EMPTY_BIG
    dummy[5:64:8] = -EMPTY_BIG
    nodes = np.stack(rows)
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
      lane  96 + t:            triangle t original prim id (exact float)

    12 lanes/tri caps rows at 8 triangles — build with
    ``max_leaf_primitives <= 8``. Degenerate (zero-area) triangles get a
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
    if counts.max(initial=0) > 8:
        raise ValueError(
            "woop leaf rows hold <= 8 triangles (12 lanes each); build "
            f"with max_leaf_primitives<=8 (got {counts.max()})"
        )
    tri = vertices[faces[indices]]  # (L, 3, 3) leaf-ordered, f64
    p0 = tri[:, 0]
    e1 = tri[:, 1] - p0
    e2 = tri[:, 2] - p0
    n = np.cross(e1, e2)
    E = np.stack([e1, e2, n], axis=-1)  # columns
    det = np.linalg.det(E)
    ok = np.abs(det) > 0.0
    Esafe = np.where(ok[:, None, None], E, np.eye(3)[None])
    M = np.linalg.inv(Esafe)
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
    rows[row_idx[:, None], 12 * within[:, None] + np.arange(12)] = (
        flat[l_idx]
    )
    rows[row_idx, 96 + within] = pid_all[l_idx].astype(np.float32)
    return rows
