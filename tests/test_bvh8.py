"""BVH8 collapse structural tests (CPU). The Pallas packet kernel itself
is exercised on real TPU via tools/verify_pallas.py; here we validate the
collapse + packing logic host-side by emulating the kernel's traversal in
NumPy."""

import numpy as np
import pytest

from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import MAX_LEAF_TRIS, collapse_bvh8
from nanort_tpu.io.procedural import make_random_triangles, make_uv_sphere
from nanort_tpu.ops.triangle import TriangleMesh


def _build8(v, f, leaf=8):
    mesh = TriangleMesh(vertices=v, faces=f)
    opts = BVHBuildOptions(min_leaf_primitives=leaf, max_leaf_primitives=leaf)
    bvh, _ = build_triangle_bvh(mesh, opts)
    return bvh, collapse_bvh8(bvh, v, f)


def test_collapse_covers_all_prims():
    v, f = make_uv_sphere(12, 24)
    bvh, s8 = _build8(v, f)
    # every original prim id appears exactly once in the leaf table
    pids = []
    nodes = s8.nodes
    for r in range(s8.num_leaf_rows):
        ids = s8.leafs[r, 90:100].astype(np.int32)
        # count comes from node meta; recover from node table
    # walk the BVH8 tree instead
    seen = []
    stack = [0]
    while stack:
        i = stack.pop()
        row = nodes[i]
        metas = row[64:72].astype(np.int32)
        cnts = row[72:80].astype(np.int32)
        for c in range(8):
            lo = row[8 * c : 8 * c + 3]
            hi = row[8 * c + 3 : 8 * c + 6]
            if lo[0] > hi[0]:
                continue  # empty slot
            m = metas[c]
            if m >= 0:
                stack.append(m)
            else:
                lr = -m - 1
                k = cnts[c]
                assert 1 <= k <= MAX_LEAF_TRIS
                seen.extend(s8.leafs[lr, 90 : 90 + k].astype(np.int32).tolist())
    assert sorted(seen) == list(range(len(f)))


def test_collapse_bounds_contain_children():
    v, f = make_random_triangles(600, seed=2)
    bvh, s8 = _build8(v, f)
    nodes = s8.nodes
    stack = [(0, None)]
    while stack:
        i, pbox = stack.pop()
        row = nodes[i]
        metas = row[64:72].astype(np.int32)
        for c in range(8):
            lo = row[8 * c : 8 * c + 3].copy()
            hi = row[8 * c + 3 : 8 * c + 6].copy()
            if lo[0] > hi[0]:
                continue
            if pbox is not None:
                plo, phi = pbox
                eps = 1e-5 * (1 + np.abs(phi).max())
                assert (lo >= plo - eps).all() and (hi <= phi + eps).all()
            if metas[c] >= 0:
                stack.append((metas[c], (lo, hi)))


def test_leaf_triangles_match_mesh():
    v, f = make_uv_sphere(8, 16)
    bvh, s8 = _build8(v, f, leaf=4)
    nodes = s8.nodes
    stack = [0]
    while stack:
        i = stack.pop()
        row = nodes[i]
        metas = row[64:72].astype(np.int32)
        cnts = row[72:80].astype(np.int32)
        for c in range(8):
            if row[8 * c] > row[8 * c + 3]:
                continue
            if metas[c] >= 0:
                stack.append(metas[c])
                continue
            lr = -metas[c] - 1
            for t in range(cnts[c]):
                pid = int(s8.leafs[lr, 90 + t].astype(np.int32))
                tri = s8.leafs[lr, 9 * t : 9 * t + 9].reshape(3, 3)
                np.testing.assert_array_equal(tri, v[f[pid]])


def test_oversized_leaf_rejected():
    v, f = make_uv_sphere(8, 16)
    mesh = TriangleMesh(vertices=v, faces=f)
    opts = BVHBuildOptions(min_leaf_primitives=32, max_leaf_primitives=32)
    bvh, _ = build_triangle_bvh(mesh, opts)
    with pytest.raises(ValueError):
        collapse_bvh8(bvh, v, f)


def test_woop_leaf_table_math():
    """The Woop unit-triangle transform (build_woop_leafs) must reproduce
    the watertight intersector's (t, u, v) to fp32 tolerance when applied
    with the kernel's formula o' = M (o - p0), d' = M d,
    t = -o'z / d'z, u = o'x + t d'x, v = o'y + t d'y."""
    from nanort_tpu.build.bvh8 import build_woop_leafs

    rng = np.random.default_rng(7)
    v, f = make_uv_sphere(12, 24)
    bvh, s8 = _build8(v, f)
    rows = build_woop_leafs(bvh, v, f)
    assert rows.shape == (s8.num_leaf_rows, 128)

    # walk every (row, slot), fire a ray at a random interior point of
    # that triangle, and compare against direct geometric evaluation
    nodes = s8.nodes
    checked = 0
    for r in range(s8.num_leaf_rows):
        pids = rows[r, 108:117].astype(np.int32)
        for t_i in range(9):
            M = rows[r, 12 * t_i : 12 * t_i + 9].reshape(3, 3)
            p0 = rows[r, 12 * t_i + 9 : 12 * t_i + 12]
            if not np.any(M):
                continue
            pid = pids[t_i]
            tri = v[f[pid]].astype(np.float64)
            uv = rng.uniform(0.05, 0.4, 2)
            target = (
                (1 - uv[0] - uv[1]) * tri[0]
                + uv[0] * tri[1]
                + uv[1] * tri[2]
            )
            org = target + np.array([0.3, -0.2, 1.7])
            d = (target - org).astype(np.float32)
            org = org.astype(np.float32)
            rel = org - p0
            op = M @ rel
            dp = M @ d
            tt = -op[2] / dp[2]
            uu = op[0] + tt * dp[0]
            vv = op[1] + tt * dp[1]
            assert abs(tt - 1.0) < 1e-4
            assert abs(uu - uv[0]) < 1e-4
            assert abs(vv - uv[1]) < 1e-4
            checked += 1
    assert checked > 100


def test_woop_degenerate_triangle_never_hits():
    from nanort_tpu.build.bvh8 import build_woop_leafs

    v = np.array(
        [[0, 0, 0], [1, 0, 0], [2, 0, 0],  # collinear: zero area
         [0, 0, 1], [1, 0, 1], [0, 1, 1]], np.float32
    )
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
    mesh = TriangleMesh(vertices=v, faces=f)
    opts = BVHBuildOptions(min_leaf_primitives=2, max_leaf_primitives=2)
    bvh, _ = build_triangle_bvh(mesh, opts)
    rows = build_woop_leafs(bvh, v, f)
    pids = rows[0, 108:117].astype(np.int32)
    slot = int(np.nonzero(pids == 0)[0][0])
    M = rows[0, 12 * slot : 12 * slot + 9].reshape(3, 3)
    # degenerate triangle gets the zero matrix: d'z == 0 for every ray,
    # t = -o'z/d'z is inf/NaN and the unit-triangle test can never pass
    np.testing.assert_array_equal(M, 0.0)


# ---- 16-wide collapse (dense single-row nodes: exact f32 boxes at
# lanes [6w, 6w+6), metas 96+w, counts 112+w with axis*16 folded into
# the child-0 count lane) ----

def _unpack16(blk, w):
    return blk[6 * w: 6 * w + 3], blk[6 * w + 3: 6 * w + 6]


def _walk16(nodes, root=0):
    """Yield (node_id, child_box_lo, child_box_hi, meta, cnt) over the
    16-wide tree; meta >= 0 is a child node id, < 0 a leaf row."""
    stack = [root]
    while stack:
        nid = stack.pop()
        blk = nodes[nid]
        for w in range(16):
            lo, hi = _unpack16(blk, w)
            if lo[0] > hi[0]:  # inverted box: empty slot
                continue
            meta = int(blk[96 + w])
            cnt = int(blk[112 + w]) & 15
            yield nid, lo, hi, meta, cnt
            if meta >= 0:
                stack.append(meta)


def test_collapse16_covers_all_prims_and_bounds():
    from nanort_tpu.build.bvh8 import collapse_bvh16

    v, f = make_uv_sphere(16, 32)
    mesh = TriangleMesh(vertices=v, faces=f)
    opts = BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9)
    bvh, _ = build_triangle_bvh(mesh, opts)
    s16 = collapse_bvh16(bvh, v, f)
    assert s16.width == 16
    assert s16.nodes.shape[0] == s16.num_nodes + 1  # packed: 1 row/node

    pids = []
    for nid, lo, hi, meta, cnt in _walk16(s16.nodes):
        if meta < 0:
            row = s16.leafs[-meta - 1]
            for t in range(cnt):
                pids.append(int(row[90 + t]))
                # leaf triangle vertices inside the child box (eps pad)
                tri = row[9 * t: 9 * t + 9].reshape(3, 3)
                assert (tri.min(0) >= lo - 1e-4).all()
                assert (tri.max(0) <= hi + 1e-4).all()
    assert sorted(pids) == list(range(len(f)))

    # internal child boxes contain their node's own children (exact f32
    # boxes in the dense layout: no epsilon needed)
    boxes = {}  # node id -> (lo, hi) as promised by the parent
    for nid, lo, hi, meta, cnt in _walk16(s16.nodes):
        if meta >= 0:
            boxes[meta] = (lo.copy(), hi.copy())
    for nid, (plo, phi) in boxes.items():
        blk = s16.nodes[nid]
        for w in range(16):
            lo, hi = _unpack16(blk, w)
            if lo[0] > hi[0]:
                continue
            assert (lo >= plo).all()
            assert (hi <= phi).all()


def test_collapse16_traversal_matches_brute_force():
    import jax.numpy as jnp

    from nanort_tpu import brute_force_traverse, make_rays
    from nanort_tpu.build.bvh8 import collapse_bvh16

    v, f = make_uv_sphere(16, 32)
    mesh = TriangleMesh(vertices=v, faces=f)
    opts = BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9)
    bvh, _ = build_triangle_bvh(mesh, opts)
    s16 = collapse_bvh16(bvh, v, f)

    rng = np.random.default_rng(9)
    n = 200
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-0.8, 0.8, (n, 3))
    d = tgt - org
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    want = brute_force_traverse(
        mesh, make_rays(jnp.asarray(org), jnp.asarray(d))
    )
    want_pid = np.asarray(want.prim_id)
    want_t = np.asarray(want.t)

    nodes, leafs = s16.nodes, s16.leafs
    for i in range(n):
        best_t, best_p = np.float64(np.finfo(np.float32).max), -1
        stack = [0]
        inv = np.where(np.abs(d[i]) < 1e-30, np.inf, 1.0 / d[i])
        while stack:
            nid = stack.pop()
            blk = nodes[nid]
            for w in range(16):
                lo, hi = _unpack16(blk, w)
                if lo[0] > hi[0]:
                    continue
                t0 = (np.where(inv < 0, hi, lo) - org[i]) * inv
                t1 = (np.where(inv < 0, lo, hi) - org[i]) * inv
                tmin = max(0.0, np.nanmax(t0))
                tmax = min(best_t, np.nanmin(t1) * 1.00000024)
                if tmin > tmax:
                    continue
                meta = int(blk[96 + w])
                if meta >= 0:
                    stack.append(meta)
                    continue
                row = leafs[-meta - 1]
                for ti in range(int(blk[112 + w]) & 15):
                    p0 = row[9 * ti: 9 * ti + 3].astype(np.float64)
                    p1 = row[9 * ti + 3: 9 * ti + 6].astype(np.float64)
                    p2 = row[9 * ti + 6: 9 * ti + 9].astype(np.float64)
                    e1, e2 = p1 - p0, p2 - p0
                    pv = np.cross(d[i].astype(np.float64), e2)
                    det = np.dot(e1, pv)
                    if abs(det) < 1e-30:
                        continue
                    tv = org[i].astype(np.float64) - p0
                    u = np.dot(tv, pv) / det
                    qv = np.cross(tv, e1)
                    vv = np.dot(d[i].astype(np.float64), qv) / det
                    t = np.dot(e2, qv) / det
                    if u < 0 or vv < 0 or u + vv > 1 or t < 0 or t > best_t:
                        continue
                    best_t, best_p = t, int(row[90 + ti])
        if want_pid[i] == 0xFFFFFFFF:
            assert best_p == -1, i
        else:
            assert best_p != -1, i
            assert abs(best_t - want_t[i]) < 1e-3 * max(1.0, want_t[i]), i


def test_merge_leafs_occupancy_and_woop_consistency():
    """merge_leafs bin-packs adjacent sibling leaves: fewer rows, same
    prim coverage, and collapse(woop=True) rows must describe the SAME
    triangles slot-for-slot as the watertight rows."""
    from nanort_tpu.build.bvh8 import collapse_bvh8

    v, f = make_random_triangles(20_000, seed=4)
    mesh = TriangleMesh(vertices=v, faces=f)
    opts = BVHBuildOptions(min_leaf_primitives=9, max_leaf_primitives=9)
    bvh, _ = build_triangle_bvh(mesh, opts)
    plain = collapse_bvh8(bvh, v, f, merge_leafs=False)
    merged = collapse_bvh8(bvh, v, f, merge_leafs=True, woop=True)
    assert merged.num_leaf_rows < plain.num_leaf_rows
    assert merged.num_nodes <= plain.num_nodes
    assert merged.max_leaf <= 9

    def walk(s8):
        out = {}
        stack = [0]
        while stack:
            nid = stack.pop()
            row = s8.nodes[nid]
            for c in range(8):
                if row[8 * c] >= 3.0e38:
                    continue
                meta = int(row[64 + c])
                if meta >= 0:
                    stack.append(meta)
                    continue
                lr = -meta - 1
                cnt = int(row[72 + c])
                lo = row[8 * c: 8 * c + 3]
                hi = row[8 * c + 3: 8 * c + 6]
                for t in range(cnt):
                    pid = int(s8.leafs[lr, 90 + t])
                    assert pid not in out
                    tri = s8.leafs[lr, 9 * t: 9 * t + 9].reshape(3, 3)
                    assert (tri.min(0) >= lo - 1e-3).all()
                    assert (tri.max(0) <= hi + 1e-3).all()
                    out[pid] = (lr, t)
        return out

    cov_p = walk(plain)
    cov_m = walk(merged)
    assert sorted(cov_p) == list(range(len(f)))
    assert sorted(cov_m) == list(range(len(f)))

    # woop rows: slot s of row r transforms the same triangle as the
    # watertight row's slot s (pid lanes agree; M maps its verts to the
    # unit triangle)
    for pid, (lr, t) in list(cov_m.items())[:512]:
        assert int(merged.leafs_woop[lr, 108 + t]) == pid
        M = merged.leafs_woop[lr, 12 * t: 12 * t + 9].reshape(3, 3)
        p0 = merged.leafs_woop[lr, 12 * t + 9: 12 * t + 12]
        tri = merged.leafs[lr, 9 * t: 9 * t + 9].reshape(3, 3)
        e1 = (tri[1] - p0) @ M.T
        e2 = (tri[2] - p0) @ M.T
        np.testing.assert_allclose(e1, [1, 0, 0], atol=2e-3)
        np.testing.assert_allclose(e2, [0, 1, 0], atol=2e-3)


def test_dense16_axis_folding_roundtrip():
    """The dense BVH16 layout folds the near-first order axis into the
    child-0 count lane as cnt + 16*axis; every count consumer masks
    & 15 and the axis decodes by >= 16/32 thresholds."""
    for axis in range(3):
        for cnt in range(10):
            lane = np.float32(cnt + 16 * axis)
            got_axis = 2 if lane >= 32 else (1 if lane >= 16 else 0)
            assert got_axis == axis
            assert int(lane) & 15 == cnt


def test_detect_specialization_flags():
    """Camera primaries in power-of-two tiles: shared origin + static kz
    + per-packet uniform signs; random batches: none of the three."""
    from nanort_tpu.models.cameras import look_at, pinhole_rays
    from nanort_tpu.traverse.pallas_packet import (
        detect_specialization, tile_image_rays,
    )
    from nanort_tpu.core.ray import Rays
    import jax.numpy as jnp

    cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0),
                  width=256, height=256, fov=60.0)
    rays_t, _ = tile_image_rays(pinhole_rays(cam), 128, 32)
    spec = detect_specialization(rays_t, sub=32)
    assert spec is not None and len(spec) == 3
    kz, shared, usign = spec
    assert kz == 2 and shared and usign
    # 2-tuple back-compat without sub
    spec2 = detect_specialization(rays_t)
    assert spec2 == (2, True)

    # random directions: no uniform signs per packet, no shared origin
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64 * 128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-1, 1, (64 * 128, 3)).astype(np.float32)
    r = Rays(org=jnp.asarray(o), dir=jnp.asarray(d),
             min_t=jnp.zeros(64 * 128, jnp.float32),
             max_t=jnp.full((64 * 128,), 1e30, jnp.float32))
    s3 = detect_specialization(r, sub=8)
    assert s3 is None or (s3[1] is False and s3[2] is False)

    # dead rays don't break uniformity: one packet all-positive live
    # rays + dead rays with negative dirs
    dd = np.tile(np.asarray([[1.0, 0.5, 0.25]], np.float32), (1024, 1))
    dd[512:] = [-1.0, -0.5, -0.25]
    maxt = np.full(1024, 1e30, np.float32)
    maxt[512:] = -1.0  # dead (max_t < min_t = 0)
    r2 = Rays(org=jnp.zeros((1024, 3), jnp.float32), dir=jnp.asarray(dd),
              min_t=jnp.zeros(1024, jnp.float32), max_t=jnp.asarray(maxt))
    s4 = detect_specialization(r2, sub=8)
    assert s4 is not None and s4[2] is True
