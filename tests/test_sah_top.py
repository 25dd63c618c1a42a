"""Device-side binned-SAH top phase (build/sah_top.py): partition
invariants, spliced-topology traversal parity vs the brute oracle, and
the quality claim (SAH-top wide-tree cost never worse than plain LBVH).

The reordering SAH phase exists because r3 measured contiguous-order
top-tree tweaks ~20% WORSE than Karras (lbvh.hybrid_deltas docstring):
the quality tax lives in the primitive order. These tests pin that the
reordered pipeline still emits exactly-covering, cycle-free tables.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nanort_tpu import brute_force_traverse, make_rays
from nanort_tpu.build.device_collapse import collapse_lbvh_device
from nanort_tpu.build.sah_top import sah_top_partition
from nanort_tpu.io.procedural import (
    make_cornell_box,
    make_random_triangles,
    make_uv_sphere,
    merge_meshes,
)
from nanort_tpu.ops.triangle import TriangleMesh

from tests.test_device_collapse import _slots, _walk


def _prim_bounds(v, f):
    tri = np.asarray(v)[np.asarray(f)]
    return tri.min(axis=1), tri.max(axis=1)


def test_partition_is_permutation_and_contiguous():
    v, f = make_random_triangles(3000, seed=11)
    lo, hi = _prim_bounds(v, f)
    c = 0.5 * (lo + hi)
    # morton-order inputs are not required for the invariants; any order
    perm, codes = sah_top_partition(
        jnp.asarray(c), jnp.asarray(lo), jnp.asarray(hi), 3000,
        levels=6, bins=8, stop_cap=16)
    perm = np.asarray(perm)
    codes = np.asarray(codes)
    assert sorted(perm.tolist()) == list(range(3000))
    # prims sharing a range code are contiguous
    change = np.flatnonzero(np.diff(codes) != 0)
    assert len(np.unique(codes)) == len(change) + 1
    # codes are 6-bit and non-decreasing blocks partition the array
    assert codes.min() >= 0 and codes.max() < 64


def test_stop_cap_ranges_keep_input_order():
    # stable partition: prims inside a final range preserve input order
    v, f = make_uv_sphere(20, 40, 1.0)
    lo, hi = _prim_bounds(v, f)
    n = len(f)
    perm, codes = sah_top_partition(
        jnp.asarray(0.5 * (lo + hi)), jnp.asarray(lo), jnp.asarray(hi),
        n, levels=5, bins=8, stop_cap=64)
    perm = np.asarray(perm)
    codes = np.asarray(codes)
    for r in np.unique(codes):
        seg = perm[codes == r]
        assert (np.diff(seg) > 0).all(), "in-range order not stable"


@pytest.mark.parametrize("sah_levels", [4, 9])
def test_sah_top_closest_hit_parity(sah_levels):
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(12, 24, 0.5))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    s = collapse_lbvh_device(v, f, width=16, max_leaf=9,
                             sah_levels=sah_levels, sah_stop=16)
    nodes = np.asarray(s.nodes).reshape(-1, 128)
    leafs = np.asarray(s.leafs)

    # every prim appears exactly once across reachable leaf slots
    seen = []
    for _, lo, hi, meta, cnt in _walk(s):
        if meta < 0:
            row = leafs[-meta - 1]
            seen += [int(row[90 + t]) for t in range(cnt)]
    assert sorted(seen) == list(range(len(f)))

    rng = np.random.default_rng(3)
    n = 120
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
            for lo, hi, meta, cnt in _slots(nodes[stack.pop()], 16):
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
                    vv = np.dot(d[i].astype(np.float64),
                                np.cross(tv, e1)) / det
                    t = np.dot(e2, np.cross(tv, e1)) / det
                    if u < 0 or vv < 0 or u + vv > 1 or t < 0 or t > best_t:
                        continue
                    best_t, best_p = t, int(row[90 + ti])
        if want_pid[i] == 0xFFFFFFFF:
            assert best_p == -1, i
        else:
            assert best_p != -1, i
            assert abs(best_t - want_t[i]) < 1e-3 * max(1.0, want_t[i]), i


def _wide_cost(s):
    nodes = np.asarray(s.nodes)[: s.num_nodes]
    occ0 = nodes[0, 0:96:6] < 1e37
    ch0 = nodes[0, 0:96].reshape(16, 6)[occ0]
    rlo = ch0[:, :3].min(axis=0)
    rhi = ch0[:, 3:].max(axis=0)
    d0 = np.maximum(rhi - rlo, 0)
    root_sa = d0[0] * d0[1] + d0[1] * d0[2] + d0[2] * d0[0]
    tot = 0.0
    for w in range(16):
        box = nodes[:, 6 * w: 6 * w + 6]
        occ = box[:, 0] < 1e37
        dd = np.maximum(box[occ, 3:] - box[occ, :3], 0)
        sa = dd[:, 0] * dd[:, 1] + dd[:, 1] * dd[:, 2] + dd[:, 2] * dd[:, 0]
        leaf = nodes[occ, 96 + w] < 0
        cnt = nodes[occ, 112 + w].astype(np.int64) & 15
        tot += sa[~leaf].sum() + (sa[leaf] * cnt[leaf]).sum()
    return tot / max(root_sa, 1e-30)


def test_sah_top_quality_not_worse():
    v, f = make_random_triangles(30000, seed=5)
    c_lbvh = _wide_cost(collapse_lbvh_device(v, f, width=16, max_leaf=9))
    c_sah = _wide_cost(collapse_lbvh_device(v, f, width=16, max_leaf=9,
                                            sah_levels=10, sah_stop=32))
    assert c_sah <= c_lbvh * 1.02, (c_sah, c_lbvh)
