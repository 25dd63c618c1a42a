"""Device-side LBVH collapse (build/device_collapse.py): structural
validation of the emitted packet tables + closest-hit parity vs the
brute-force oracle via a host walker (the Pallas kernel itself is
exercised on real TPU by tools/; these tests pin the table format)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nanort_tpu import brute_force_traverse, make_rays
from nanort_tpu.build.device_collapse import collapse_lbvh_device
from nanort_tpu.io.procedural import (
    make_cornell_box,
    make_random_triangles,
    make_uv_sphere,
    merge_meshes,
)
from nanort_tpu.ops.triangle import TriangleMesh


def _slots(blk, width):
    """Yield (lo, hi, meta, cnt) for occupied slots of one node block
    (flattened (NR*128,) f32)."""
    for w in range(width):
        if width == 16:
            lo = blk[6 * w: 6 * w + 3]
            hi = blk[6 * w + 3: 6 * w + 6]
            meta = int(blk[96 + w])
            cnt = int(blk[112 + w]) & 15
        else:
            r, c = divmod(w, 8)
            lo = blk[r * 128 + 8 * c: r * 128 + 8 * c + 3]
            hi = blk[r * 128 + 8 * c + 3: r * 128 + 8 * c + 6]
            meta = int(blk[r * 128 + 64 + c])
            cnt = int(blk[r * 128 + 72 + c])
        if lo[0] > hi[0]:
            continue
        yield lo, hi, meta, cnt


def _walk(scene):
    NR = 1 if scene.width == 16 else scene.width // 8
    nodes = np.asarray(scene.nodes).reshape(-1, NR * 128)
    stack, out = [0], []
    seen_nodes = set()
    while stack:
        nid = stack.pop()
        assert nid not in seen_nodes, "node revisited: cycle"
        seen_nodes.add(nid)
        for lo, hi, meta, cnt in _slots(nodes[nid], scene.width):
            out.append((nid, lo, hi, meta, cnt))
            if meta >= 0:
                assert meta < scene.num_nodes
                stack.append(meta)
    return out


@pytest.mark.parametrize("width", [8, 16])
def test_device_collapse_structure(width):
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(16, 32, 0.5))
    s = collapse_lbvh_device(v, f, width=width, max_leaf=9)
    assert s.width == width
    leafs = np.asarray(s.leafs)
    pids = []
    for nid, lo, hi, meta, cnt in _walk(s):
        if meta < 0:
            row = leafs[-meta - 1]
            assert 1 <= cnt <= 9
            for t in range(cnt):
                pid = int(row[90 + t])
                pids.append(pid)
                tri = row[9 * t: 9 * t + 9].reshape(3, 3)
                assert (tri.min(0) >= lo - 1e-4).all()
                assert (tri.max(0) <= hi + 1e-4).all()
    assert sorted(pids) == list(range(len(f)))  # exact coverage, no dups


def test_device_collapse_parent_contains_child():
    v, f = make_random_triangles(5_000, seed=7)
    s = collapse_lbvh_device(v, f, width=16, max_leaf=9)
    NR = 1
    nodes = np.asarray(s.nodes).reshape(-1, NR * 128)
    promised = {}
    for nid, lo, hi, meta, cnt in _walk(s):
        if meta >= 0:
            promised[meta] = (lo, hi)
    for cid, (plo, phi) in promised.items():
        for lo, hi, meta, cnt in _slots(nodes[cid], 16):
            assert (lo >= plo - 1e-5).all()
            assert (hi <= phi + 1e-5).all()


@pytest.mark.parametrize("width", [8, 16])
def test_device_collapse_closest_hit_parity(width):
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(12, 24, 0.5))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    s = collapse_lbvh_device(v, f, width=width, max_leaf=9)
    NR = 1 if width == 16 else width // 8
    nodes = np.asarray(s.nodes).reshape(-1, NR * 128)
    leafs = np.asarray(s.leafs)

    rng = np.random.default_rng(3)
    n = 150
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-0.8, 0.8, (n, 3))
    d = tgt - org
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    want = brute_force_traverse(mesh, make_rays(jnp.asarray(org),
                                                jnp.asarray(d)))
    want_pid = np.asarray(want.prim_id)
    want_t = np.asarray(want.t)

    for i in range(n):
        best_t, best_p = float(np.finfo(np.float32).max), -1
        inv = np.where(np.abs(d[i]) < 1e-30, np.inf, 1.0 / d[i])
        stack = [0]
        while stack:
            for lo, hi, meta, cnt in _slots(nodes[stack.pop()], width):
                t0 = (np.where(inv < 0, hi, lo) - org[i]) * inv
                t1 = (np.where(inv < 0, lo, hi) - org[i]) * inv
                if max(0.0, np.nanmax(t0)) > min(
                        best_t, np.nanmin(t1) * 1.00000024):
                    continue
                if meta >= 0:
                    stack.append(meta)
                    continue
                row = leafs[-meta - 1]
                for ti in range(cnt):
                    p0, p1, p2 = (row[9 * ti + 3 * k: 9 * ti + 3 * k + 3]
                                  .astype(np.float64) for k in range(3))
                    e1, e2 = p1 - p0, p2 - p0
                    pv = np.cross(d[i].astype(np.float64), e2)
                    det = np.dot(e1, pv)
                    if abs(det) < 1e-30:
                        continue
                    tv = org[i].astype(np.float64) - p0
                    u = np.dot(tv, pv) / det
                    vv = np.dot(d[i].astype(np.float64), np.cross(tv, e1))
                    vv = vv / det
                    t = np.dot(e2, np.cross(tv, e1)) / det
                    if u < 0 or vv < 0 or u + vv > 1 or t < 0 or t > best_t:
                        continue
                    best_t, best_p = t, int(row[90 + ti])
        if want_pid[i] == 0xFFFFFFFF:
            assert best_p == -1, i
        else:
            assert best_p != -1, i
            assert abs(best_t - want_t[i]) < 1e-3 * max(1.0, want_t[i]), i


@pytest.mark.parametrize("width", [8, 16])
def test_device_collapse_woop_table(width):
    """Device-baked turbo table: per-slot prim ids mirror the watertight
    rows, and every 12-float transform matches the host builder's f64
    math (bvh8._woop_transforms_from) to a few ulp — the device path
    computes the cross products as Dekker two-product differences."""
    from nanort_tpu.build.bvh8 import _woop_transforms_from

    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(12, 24, 0.5))
    s = collapse_lbvh_device(v, f, width=width, max_leaf=9, woop=True)
    assert s.leafs_woop is not None
    leafs = np.asarray(s.leafs)
    lw = np.asarray(s.leafs_woop)
    assert lw.shape == leafs.shape
    pids, got = [], []
    for nid, lo, hi, meta, cnt in _walk(s):
        if meta < 0:
            r = -meta - 1
            for t in range(cnt):
                pid = int(leafs[r, 90 + t])
                assert int(lw[r, 108 + t]) == pid
                pids.append(pid)
                got.append(lw[r, 12 * t: 12 * t + 12])
    assert sorted(pids) == list(range(len(f)))
    got = np.stack(got)
    want = _woop_transforms_from(v, f, np.asarray(pids))
    # anchor columns are straight copies of p0
    np.testing.assert_array_equal(got[:, 9:], want[:, 9:])
    scale = np.maximum(np.abs(want[:, :9]).max(axis=1, keepdims=True),
                       1e-3)
    rel = np.abs(got[:, :9] - want[:, :9]) / scale
    assert rel.max() < 5e-6, rel.max()


def test_device_collapse_woop_tiny_scene():
    v, f = make_random_triangles(4, seed=2)
    s = collapse_lbvh_device(v, f, width=16, max_leaf=9, woop=True)
    from nanort_tpu.build.bvh8 import _woop_transforms_from

    lw = np.asarray(s.leafs_woop)
    want = _woop_transforms_from(v, f, np.arange(4))
    for t in range(4):
        assert int(lw[0, 108 + t]) == t
        np.testing.assert_allclose(lw[0, 12 * t: 12 * t + 12], want[t],
                                   rtol=0, atol=0)


def test_device_collapse_tiny_scene():
    v, f = make_random_triangles(5, seed=1)
    s = collapse_lbvh_device(v, f, width=16, max_leaf=9)
    assert s.num_nodes == 1 and s.num_leaf_rows == 1
    rows = _walk(s)
    assert len(rows) == 1
    _, lo, hi, meta, cnt = rows[0]
    assert meta == -1 and cnt == 5
