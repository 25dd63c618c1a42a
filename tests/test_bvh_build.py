"""BVH builder: structural invariants, serialization round-trip, stats.

Property tests the reference never had (SURVEY.md §4): every prim in
exactly one leaf, child bboxes within parent, DFS preorder layout,
Dump/Load byte format round-trip."""

import io

import numpy as np
import pytest

from nanort_tpu import (
    BVHBuildOptions,
    build_triangle_bvh,
    dump,
    load,
    validate,
)
from nanort_tpu.core.bvh import compute_skip_links, node_record_dtype, stats_from_bvh
from nanort_tpu.io.procedural import (
    make_cornell_box,
    make_random_triangles,
    make_uv_sphere,
)
from nanort_tpu.ops.triangle import TriangleMesh, triangle_prim_bounds


def _mesh(kind):
    if kind == "box":
        v, f = make_cornell_box()
    elif kind == "sphere":
        v, f = make_uv_sphere(12, 24)
    else:
        v, f = make_random_triangles(500, seed=3)
    return TriangleMesh(vertices=v, faces=f)


@pytest.mark.parametrize("kind", ["box", "sphere", "soup"])
def test_invariants(kind):
    mesh = _mesh(kind)
    bvh, stats = build_triangle_bvh(mesh)
    pbmin, pbmax, _ = triangle_prim_bounds(mesh)
    validate(bvh, pbmin, pbmax, num_prims=mesh.num_faces)
    assert stats.num_leaf_nodes + stats.num_branch_nodes == bvh.num_nodes
    assert stats.build_secs > 0


def test_single_triangle():
    mesh = TriangleMesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        faces=np.array([[0, 1, 2]], np.int32),
    )
    bvh, stats = build_triangle_bvh(mesh)
    assert bvh.num_nodes == 1 and bvh.flag[0] == 1
    assert stats.num_leaf_nodes == 1 and stats.num_branch_nodes == 0


def test_identical_centroids_fallback():
    # many triangles with the same centroid: SAH cuts degenerate on all
    # axes; the median fallback must still terminate with capped leaves
    v, f = make_random_triangles(64, seed=0, extent=0.0, tri_size=0.1)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(mesh)
    validate(bvh, num_prims=64)
    counts = bvh.data[bvh.flag == 1, 0]
    assert counts.max() <= BVHBuildOptions().max_leaf_primitives


def test_leaf_cap_enforced():
    v, f = make_random_triangles(2000, seed=1)
    opts = BVHBuildOptions(max_leaf_primitives=8, min_leaf_primitives=8)
    bvh, _ = build_triangle_bvh(TriangleMesh(vertices=v, faces=f), opts)
    counts = bvh.data[bvh.flag == 1, 0]
    assert counts.max() <= 8


def test_node_record_layout():
    # BVHNode<float> is exactly 40 bytes, BVHNode<double> 64 (nanort.h:498)
    assert node_record_dtype(np.float32).itemsize == 40
    assert node_record_dtype(np.float64).itemsize == 64


def test_dump_load_roundtrip():
    mesh = _mesh("sphere")
    bvh, _ = build_triangle_bvh(mesh)
    buf = io.BytesIO()
    dump(bvh, buf)
    buf.seek(0)
    bvh2 = load(buf)
    for a, b in zip(bvh, bvh2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # binary layout spot-check: first 8 bytes = node count as uint64
    raw = buf.getvalue()
    assert np.frombuffer(raw[:8], np.uint64)[0] == bvh.num_nodes


def test_skip_links():
    mesh = _mesh("sphere")
    bvh, _ = build_triangle_bvh(mesh)
    skip = compute_skip_links(bvh)
    n = bvh.num_nodes
    assert skip[0] == n
    # preorder: for every branch, skip[left]==right and skip[right]==skip[node]
    for i in range(n):
        if bvh.flag[i] == 0:
            l, r = bvh.data[i]
            assert skip[l] == r
            assert skip[r] == skip[i]


def test_stats_consistency():
    mesh = _mesh("soup")
    bvh, stats = build_triangle_bvh(mesh)
    st2 = stats_from_bvh(bvh)
    assert st2.num_leaf_nodes == stats.num_leaf_nodes
    assert st2.num_branch_nodes == stats.num_branch_nodes
    assert st2.max_tree_depth <= stats.max_tree_depth


def test_dump_load_roundtrip_double():
    # BVHAccel<double> serialization (64-byte records)
    import jax.numpy as jnp

    v, f = make_uv_sphere(8, 16)
    mesh = TriangleMesh(
        vertices=jnp.asarray(v, jnp.float64), faces=jnp.asarray(f)
    )
    bvh, _ = build_triangle_bvh(mesh)
    assert np.asarray(bvh.bmin).dtype == np.float64
    buf = io.BytesIO()
    dump(bvh, buf)
    buf.seek(0)
    bvh2 = load(buf, real_dtype=np.float64)
    for a, b in zip(bvh, bvh2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
