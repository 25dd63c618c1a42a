"""Treelet-binned incoherent engine: host-side machinery tests.

The per-treelet packet traversal itself needs the Pallas kernel (TPU,
covered by tools/verify_treelet.py); everything around it — frontier
construction, dense K-nearest treelet selection, packet-aligned binning
— is pure host/XLA code validated here against numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import EMPTY_BIG, collapse_bvh8
from nanort_tpu.io.procedural import (
    make_cornell_box,
    make_uv_sphere,
    merge_meshes,
)
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.treelet import (
    _bin_pass,
    _treelet_klists,
    make_treelets,
)


def _scene8(n_sub=24):
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(n_sub, 2 * n_sub, 0.6))
    mesh = TriangleMesh(vertices=v, faces=f)
    opts = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    bvh, _ = build_triangle_bvh(mesh, opts)
    return v, f, collapse_bvh8(bvh, v, f)


def _collect_leaf_slots(nodes, root):
    """All (leaf_row, count) reachable from a BVH8 node row id."""
    out = []
    stack = [root]
    while stack:
        nid = stack.pop()
        row = nodes[nid]
        for c in range(8):
            if row[8 * c] >= EMPTY_BIG:
                continue
            meta = int(row[64 + c])
            if meta >= 0:
                stack.append(meta)
            else:
                out.append((-meta - 1, int(row[72 + c])))
    return out


def test_treelets_cover_leaves_exactly_once():
    _, _, s8 = _scene8()
    want = sorted(_collect_leaf_slots(np.asarray(s8.nodes), 0))
    for target in (8, 32, 64):
        tl, aug = make_treelets(s8, target)
        assert tl.count <= target
        got = []
        nodes = np.asarray(aug.nodes)
        for r in np.asarray(tl.roots):
            got.extend(_collect_leaf_slots(nodes, int(r)))
        assert sorted(got) == want


def test_flat_treelets_cover_leaves_exactly_once():
    """flat=True replaces each treelet subtree with shallow synthetic
    levels; the reachable (leaf_row, cnt) multiset must be unchanged
    (cnt compared with the child-0 axis fold masked off)."""
    _, _, s8 = _scene8()

    def masked(nodes, root):
        out = []
        stack = [root]
        while stack:
            nid = stack.pop()
            row = nodes[nid]
            for c in range(8):
                if row[8 * c] >= EMPTY_BIG:
                    continue
                meta = int(row[64 + c])
                cnt = int(row[72 + c]) & 15 if c == 0 else int(row[72 + c])
                if meta >= 0:
                    stack.append(meta)
                else:
                    out.append((-meta - 1, cnt))
        return out

    want = sorted(masked(np.asarray(s8.nodes), 0))
    for target in (8, 32):
        tl, aug = make_treelets(s8, target, flat=True)
        nodes = np.asarray(aug.nodes)
        got = []
        depths = []
        for r in np.asarray(tl.roots):
            got.extend(masked(nodes, int(r)))
            # flat trees are shallow: depth <= ceil(log8(rows)) + 1
            d, stack = 0, [(int(r), 1)]
            while stack:
                nid, dep = stack.pop()
                d = max(d, dep)
                row = nodes[nid]
                for c in range(8):
                    if row[8 * c] < EMPTY_BIG and row[64 + c] >= 0:
                        stack.append((int(row[64 + c]), dep + 1))
            depths.append(d)
        assert sorted(got) == want
        assert max(depths) <= 3  # ~100 rows/treelet -> 2 fan-8 levels

    # flat child AABBs must still contain their leaf rows' geometry:
    # e2e equality below is the functional check
    tl_n, aug_n = make_treelets(s8, 32)
    from nanort_tpu.traverse import treelet as tl_mod
    from nanort_tpu.traverse import pallas_packet as _pp
    from nanort_tpu.core.ray import make_rays

    rng = np.random.default_rng(5)
    org = rng.uniform(-1.5, 1.5, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(org, d)
    import unittest.mock as mock

    with mock.patch.object(_pp, "traverse_bvh8", _fake_traverse_bvh8):
        tl_f, aug_f = make_treelets(s8, 32, flat=True)
        h_f = tl_mod.traverse_bvh8_binned(
            aug_f, rays, treelets=tl_f, K=4)
        h_n = tl_mod.traverse_bvh8_binned(
            aug_n, rays, treelets=tl_n, K=4)
    np.testing.assert_allclose(
        np.asarray(h_f.t), np.asarray(h_n.t), rtol=1e-6)
    same = np.asarray(h_f.prim_id) == np.asarray(h_n.prim_id)
    # equal-t ties may pick different prims across tree shapes; require
    # near-total agreement
    assert same.mean() > 0.99


def test_treelet_boxes_contain_subtrees():
    _, _, s8 = _scene8()
    tl, aug = make_treelets(s8, 32)
    nodes = np.asarray(aug.nodes)
    for i, r in enumerate(np.asarray(tl.roots)):
        row = nodes[int(r)]
        for c in range(8):
            if row[8 * c] >= EMPTY_BIG:
                continue
            assert np.all(row[8 * c : 8 * c + 3] >= tl.bmin[i] - 1e-6)
            assert np.all(row[8 * c + 3 : 8 * c + 6] <= tl.bmax[i] + 1e-6)


def _np_entry(org, d, bmin, bmax, min_t, max_t):
    """Numpy oracle: conservative slab entry distance per (ray, treelet),
    +inf when missed."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(np.abs(d) < np.finfo(np.float32).eps,
                       np.copysign(np.inf, d), 1.0 / d)
    neg = d < 0
    lo = np.where(neg[:, None, :], bmax[None], bmin[None])
    hi = np.where(neg[:, None, :], bmin[None], bmax[None])
    t0 = (lo - org[:, None, :]) * inv[:, None, :]
    t1 = (hi - org[:, None, :]) * inv[:, None, :] * 1.00000024
    t0 = np.where(np.isnan(t0), -np.inf, t0)
    t1 = np.where(np.isnan(t1), np.inf, t1)
    tmin = np.maximum(np.max(t0, axis=-1), min_t[:, None])
    tmax = np.minimum(np.min(t1, axis=-1), max_t[:, None])
    return np.where(tmin <= tmax, np.maximum(tmin, 0.0), np.inf)


def test_klists_match_numpy_oracle():
    _, _, s8 = _scene8()
    tl, _ = make_treelets(s8, 24)
    T = tl.count
    rng = np.random.default_rng(3)
    R, K = 1024, 4
    org = rng.uniform(-3, 3, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    min_t = np.zeros(R, np.float32)
    max_t = np.full(R, 1e30, np.float32)
    t_entry, tid, _ = _treelet_klists(
        jnp.asarray(org), jnp.asarray(d), jnp.asarray(min_t),
        jnp.asarray(max_t), jnp.asarray(tl.bmin), jnp.asarray(tl.bmax),
        K, chunk=256,
    )
    t_entry, tid = np.asarray(t_entry), np.asarray(tid)
    ref = _np_entry(org, d, tl.bmin, tl.bmax, min_t, max_t)
    for r in range(R):
        hits = np.nonzero(np.isfinite(ref[r]))[0]
        n = min(K, hits.size)
        # the k-th slot must carry the k-th smallest entry distance
        want = np.sort(ref[r, hits])[:n]
        got_tids = tid[r, :n]
        assert np.all(got_tids < T)
        np.testing.assert_allclose(t_entry[r, :n], want, rtol=1e-6)
        # empty slots marked with tid == T
        assert np.all(tid[r, n:] == T)


def test_bin_pass_slot_invariants():
    _, _, s8 = _scene8()
    tl, _ = make_treelets(s8, 16)
    T = tl.count
    rng = np.random.default_rng(5)
    R, packet = 4096, 256
    org = rng.uniform(-3, 3, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    min_t = np.zeros(R, np.float32)
    best_t = np.full(R, 1e30, np.float32)
    tid_k = rng.integers(0, T + 1, R).astype(np.int32)  # T = miss slot
    t_entry_k = rng.uniform(0, 2, R).astype(np.float32)
    total = (-(-R // packet) + T + 1) * packet
    (b_org, b_dir, b_min, b_max), pkt_root, inv_dest, active = _bin_pass(
        jnp.asarray(org), jnp.asarray(d), jnp.asarray(min_t),
        jnp.asarray(best_t), jnp.asarray(tid_k), jnp.asarray(t_entry_k),
        jnp.asarray(tl.roots), T, packet, total,
    )
    b_org, pkt_root = np.asarray(b_org), np.asarray(pkt_root)
    inv_dest, active = np.asarray(inv_dest), np.asarray(active)
    b_min_n, b_max_n = np.asarray(b_min), np.asarray(b_max)
    assert np.array_equal(active, tid_k < T)
    for r in np.nonzero(active)[0]:
        s = inv_dest[r]
        assert s < total - packet  # never on the dead packet
        # the ray's data landed in its slot
        np.testing.assert_array_equal(b_org[s], org[r])
        # slot's packet is rooted at the ray's treelet root
        assert pkt_root[s // packet] == tl.roots[tid_k[r]]
    # inactive rays map to the dead slot
    assert np.all(inv_dest[~active] == total - 1)
    # padding slots are inert: max_t < min_t
    used = np.zeros(total, bool)
    used[inv_dest[active]] = True
    pad = ~used
    assert np.all(b_max_n[pad] < b_min_n[pad])


def test_pair_sweep_machinery():
    """_pair_order/_pair_fill/_pair_merge (the 2-round engine core)
    against numpy oracles."""
    from nanort_tpu.core.options import INVALID_PRIM_ID
    from nanort_tpu.traverse.treelet import (
        _next_bucket,
        _pair_fill,
        _pair_merge,
        _pair_order,
    )
    from nanort_tpu.core.ray import Hits

    rng = np.random.default_rng(9)
    R, C, T, packet = 2048, 3, 24, 256
    td = rng.integers(0, T + 1, (R, C)).astype(np.int32)
    te = rng.uniform(0, 2, (R, C)).astype(np.float32)
    best_t = rng.uniform(0.5, 3.0, R).astype(np.float32)

    order, key_s, counts, n_act, n_padded = _pair_order(
        jnp.asarray(td), jnp.asarray(te), jnp.asarray(best_t), T, C, packet
    )
    order, key_s, counts = map(np.asarray, (order, key_s, counts))
    act_np = (td < T) & (te <= best_t[:, None])
    key_np = np.where(act_np, td, T).reshape(-1)
    assert int(n_act) == int(act_np.sum())
    np.testing.assert_array_equal(counts, np.bincount(
        key_np, minlength=T + 1)[:T])
    # order groups active pairs by tid, actives first
    np.testing.assert_array_equal(key_s, np.sort(key_np, kind="stable"))
    np.testing.assert_array_equal(key_np[order], key_s)

    # fill
    org = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
    # (R+1, 8) ray-SoA matrix [ox oy oz dx dy dz min_t max_t-slot];
    # last row = inert pad ray
    m = np.concatenate(
        [org, np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (R, 1)),
         np.zeros((R, 1), np.float32), np.full((R, 1), -1.0, np.float32)],
        axis=1)
    pad = np.asarray([[0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0, -1.0]], np.float32)
    comps = jnp.asarray(np.concatenate([m, pad], axis=0))
    assert int(n_padded) == int(
        (-(-np.bincount(key_np[key_np < T], minlength=T) // packet)
         * packet).sum())
    n_slots = _next_bucket(int(n_padded) + packet, packet)
    j_cap = min(R * C, n_slots)
    slot_comps, pkt_tid, slot_src = _pair_fill(
        jnp.asarray(order[:j_cap]), jnp.asarray(key_s[:j_cap]),
        jnp.asarray(counts), comps, jnp.asarray(best_t),
        T, C, packet, n_slots,
    )
    slot_src = np.asarray(slot_src)
    pkt_tid = np.asarray(pkt_tid)
    ox = np.asarray(slot_comps[0])
    maxt = np.asarray(slot_comps[7])
    # every active pair's ray occupies exactly one slot of its bin
    filled = slot_src < R
    assert filled.sum() == int(n_act)
    for s in np.nonzero(filled)[0]:
        r = slot_src[s]
        assert ox[s] == org[r, 0]
        assert maxt[s] == best_t[r]
        assert pkt_tid[s // packet] in td[r]
    # pad slots are inert (max_t -1 < min_t 1)
    assert np.all(maxt[~filled] == -1.0)

    # merge: random per-slot records -> per-ray min-t with consistent
    # records, equal-t tie -> max slot
    S = n_slots
    slot_t = rng.uniform(0, 4, S).astype(np.float32)
    slot_u = rng.uniform(0, 1, S).astype(np.float32)
    slot_v = rng.uniform(0, 1, S).astype(np.float32)
    slot_pid = rng.integers(0, 100, S).astype(np.uint32)
    slot_pid[rng.uniform(size=S) < 0.3] = INVALID_PRIM_ID
    best = Hits(
        t=jnp.asarray(best_t),
        u=jnp.zeros(R, jnp.float32),
        v=jnp.zeros(R, jnp.float32),
        prim_id=jnp.full((R,), INVALID_PRIM_ID, jnp.uint32),
    )
    out = _pair_merge(
        best, jnp.asarray(slot_t), jnp.asarray(slot_u),
        jnp.asarray(slot_v), jnp.asarray(slot_pid), jnp.asarray(slot_src),
    )
    out = jax.tree_util.tree_map(np.asarray, out)
    for r in range(R):
        slots = np.nonzero(
            (slot_src == r) & (slot_pid != INVALID_PRIM_ID))[0]
        if slots.size == 0 or slot_t[slots].min() > best_t[r]:
            assert out.prim_id[r] == INVALID_PRIM_ID
            assert out.t[r] == best_t[r]
            continue
        tbest = slot_t[slots].min()
        w = slots[slot_t[slots] == tbest].max()  # max slot among ties
        assert out.t[r] == tbest
        assert out.u[r] == slot_u[w]
        assert out.v[r] == slot_v[w]
        assert out.prim_id[r] == slot_pid[w]


# ---- completion-sweep exactness (unconditional at any (T, K)) ----

def _np_bvh8_traverse(nodes, leafs, org, d, min_t, max_t, root):
    """Numpy reference BVH8 traversal from a given root row (the CPU
    stand-in for the Pallas kernel in binning tests; plain f64
    Moller-Trumbore leaf test)."""
    best = (np.float64(max_t), 0.0, 0.0, np.uint32(0xFFFFFFFF))
    stack = [int(root)]
    inv = np.where(np.abs(d) < 1e-30, np.inf * np.sign(d + 1e-300), 1.0 / d)
    while stack:
        nid = stack.pop()
        row = nodes[nid]
        for c in range(8):
            if row[8 * c] >= EMPTY_BIG:
                continue
            lo, hi = row[8 * c: 8 * c + 3], row[8 * c + 3: 8 * c + 6]
            t0 = (np.where(inv < 0, hi, lo) - org) * inv
            t1 = (np.where(inv < 0, lo, hi) - org) * inv
            tmin = max(min_t, np.max(np.where(np.isnan(t0), -np.inf, t0)))
            tmax = min(best[0], np.min(np.where(np.isnan(t1), np.inf, t1)) * 1.00000024)
            if tmin > tmax:
                continue
            meta = int(row[64 + c])
            if meta >= 0:
                stack.append(meta)
                continue
            lrow = leafs[-meta - 1]
            # child-0 count lane folds the order axis (cnt + 16 * axis);
            # the kernel masks it off, so must the oracle
            cnt = int(row[72 + c]) & 15 if c == 0 else int(row[72 + c])
            for ti in range(cnt):
                p0 = lrow[9 * ti: 9 * ti + 3].astype(np.float64)
                p1 = lrow[9 * ti + 3: 9 * ti + 6].astype(np.float64)
                p2 = lrow[9 * ti + 6: 9 * ti + 9].astype(np.float64)
                e1, e2 = p1 - p0, p2 - p0
                pv = np.cross(d, e2)
                det = np.dot(e1, pv)
                if abs(det) < 1e-30:
                    continue
                tv = org - p0
                u = np.dot(tv, pv) / det
                qv = np.cross(tv, e1)
                v = np.dot(d, qv) / det
                t = np.dot(e2, qv) / det
                if u < 0 or v < 0 or u + v > 1 or t < min_t or t > best[0]:
                    continue
                best = (t, u, v, np.uint32(lrow[90 + ti]))
    return best


def _fake_traverse_bvh8(scene, rays, options=None, sub=8, packet_roots=None,
                        **kw):
    from nanort_tpu.core.ray import Hits

    nodes = np.asarray(scene.nodes)
    leafs = np.asarray(scene.leafs)
    org = np.asarray(rays.org)
    d = np.asarray(rays.dir)
    mint = np.asarray(rays.min_t)
    maxt = np.asarray(rays.max_t)
    packet = sub * 128
    roots = np.asarray(packet_roots) if packet_roots is not None else None
    R = org.shape[0]
    t = np.empty(R, np.float32)
    u = np.empty(R, np.float32)
    v = np.empty(R, np.float32)
    pid = np.empty(R, np.uint32)
    for i in range(R):
        root = int(roots[i // packet]) if roots is not None else 0
        if maxt[i] < mint[i]:
            t[i], u[i], v[i], pid[i] = maxt[i], 0, 0, 0xFFFFFFFF
            continue
        bt, bu, bv, bp = _np_bvh8_traverse(
            nodes, leafs, org[i], d[i], mint[i], maxt[i], root
        )
        t[i], u[i], v[i], pid[i] = bt, bu, bv, bp
    return Hits(t=jnp.asarray(t), u=jnp.asarray(u), v=jnp.asarray(v),
                prim_id=jnp.asarray(pid))


def _make_corridor(n=12):
    """n clusters along z; all but the last hold only corner triangles
    (their AABBs span the corridor at x=y=0 but the geometry misses an
    axial ray), the last holds a big triangle covering the axis."""
    vs, fs = [], []
    for i in range(n):
        z = float(i)
        if i < n - 1:
            for sx, sy in ((0.9, 0.9), (-0.95, -0.95)):
                a = len(vs)
                vs += [[sx, sy, z], [sx + 0.05, sy, z], [sx, sy + 0.05, z]]
                fs.append([a, a + 1, a + 2])
        else:
            a = len(vs)
            vs += [[-1.0, -1.0, z], [1.0, -1.0, z], [0.0, 1.0, z]]
            fs.append([a, a + 1, a + 2])
    return np.asarray(vs, np.float32), np.asarray(fs, np.int32)


def test_completion_sweep_exactness(monkeypatch):
    """A ray entering more treelet AABBs than K keeps its nearest hit:
    the K-list truncation miss class is closed by the completion sweep
    (VERDICT r2 item 3: exactness unconditional at any (T, K))."""
    from nanort_tpu.core.ray import make_rays
    from nanort_tpu.traverse import treelet as tl_mod

    v, f = _make_corridor(12)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=2, max_leaf_primitives=2)
    )
    s8 = collapse_bvh8(bvh, v, f)
    tl, s8aug = make_treelets(s8, 16)

    from nanort_tpu.traverse import pallas_packet as _pp

    monkeypatch.setattr(_pp, "traverse_bvh8", _fake_traverse_bvh8)

    # the axial ray + a few randoms (some hit corner tris)
    rng = np.random.default_rng(3)
    org = np.concatenate(
        [[[0.0, 0.0, -1.0]],
         rng.uniform(-1, 1, (15, 3)) * [1, 1, 0] + [0, 0, -1]]
    ).astype(np.float32)
    d = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (16, 1))
    rays = make_rays(org, d)

    # the dense phase must actually see the overflow for the test to bite
    te, ti, n_ent = tl_mod._treelet_klists(
        jnp.asarray(org), jnp.asarray(d), rays.min_t, rays.max_t,
        jnp.asarray(tl.bmin), jnp.asarray(tl.bmax), 2,
    )
    assert int(np.asarray(n_ent)[0]) > 2

    # without the completion sweep the axial ray's hit (in the FARTHEST
    # cluster) is silently missed at K=2 — the bug class being closed
    h_trunc = tl_mod.traverse_bvh8_binned(
        s8aug, rays, treelets=tl, K=2, _complete=False
    )
    assert int(np.asarray(h_trunc.prim_id)[0]) == 0xFFFFFFFF

    h = tl_mod.traverse_bvh8_binned(s8aug, rays, treelets=tl, K=2)
    want = [
        _np_bvh8_traverse(
            np.asarray(s8aug.nodes), np.asarray(s8aug.leafs),
            org[i], d[i], 0.0, np.finfo(np.float32).max, 0,
        )
        for i in range(16)
    ]
    got_pid = np.asarray(h.prim_id)
    got_t = np.asarray(h.t)
    for i in range(16):
        assert got_pid[i] == want[i][3], i
        if want[i][3] != 0xFFFFFFFF:
            assert abs(got_t[i] - want[i][0]) < 1e-4, i
