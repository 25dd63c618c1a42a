"""Traversal parity: BVH stack traversal vs the O(n) brute-force oracle.

The golden-hit-record tests the reference lacks (SURVEY.md §4): for full
scenes, every ray's (t, u, v, prim_id) from the accelerated path must match
the oracle exactly (modulo equal-t ties, which traversal order decides)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nanort_tpu import (
    BVHBuildOptions,
    BVHTraceOptions,
    brute_force_traverse,
    build_triangle_bvh,
    make_rays,
    traverse_triangles,
)
from nanort_tpu.io.procedural import (
    make_cornell_box,
    make_random_triangles,
    make_uv_sphere,
    merge_meshes,
)
from nanort_tpu.ops.triangle import TriangleMesh


def _random_rays(n, seed, dtype=jnp.float32, radius=3.0):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-radius, radius, (n, 3))
    target = rng.uniform(-0.8, 0.8, (n, 3))
    d = target - org
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return make_rays(org.astype(np.float32), d.astype(np.float32), dtype=dtype)


def _scene(kind):
    if kind == "box":
        v, f = make_cornell_box()
    elif kind == "sphere":
        v, f = make_uv_sphere(12, 24)
    elif kind == "mixed":
        v, f = merge_meshes(make_cornell_box(), make_uv_sphere(10, 20, 0.5))
    else:
        v, f = make_random_triangles(800, seed=11)
    return TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))


def assert_hits_match(got, want, rays, rtol=0.0):
    got_hit = np.asarray(got.hit)
    want_hit = np.asarray(want.hit)
    np.testing.assert_array_equal(got_hit, want_hit)
    m = got_hit
    gt, wt = np.asarray(got.t)[m], np.asarray(want.t)[m]
    if rtol == 0.0:
        # exact parity expected except where equal-t ties picked a
        # different prim (traversal order is a legitimate tie-breaker)
        same = np.asarray(got.prim_id)[m] == np.asarray(want.prim_id)[m]
        np.testing.assert_array_equal(gt[same], wt[same])
        diff = ~same
        if diff.any():
            # differing prim ids are only legal at exact t ties
            np.testing.assert_allclose(gt[diff], wt[diff], rtol=1e-6)
    else:
        np.testing.assert_allclose(gt, wt, rtol=rtol)
    # barycentrics agree where prim agrees
    same = np.asarray(got.prim_id)[m] == np.asarray(want.prim_id)[m]
    np.testing.assert_array_equal(np.asarray(got.u)[m][same], np.asarray(want.u)[m][same])
    np.testing.assert_array_equal(np.asarray(got.v)[m][same], np.asarray(want.v)[m][same])


@pytest.mark.parametrize("kind", ["box", "sphere", "mixed", "soup"])
def test_bvh_matches_brute_force(kind):
    mesh = _scene(kind)
    bvh, _ = build_triangle_bvh(mesh)
    rays = _random_rays(512, seed=42)
    want = brute_force_traverse(mesh, rays)
    got = traverse_triangles(bvh, mesh, rays)
    assert np.asarray(want.hit).any(), "test scene produced no hits"
    assert_hits_match(got, want, rays)


def test_axis_aligned_rays():
    mesh = _scene("box")
    bvh, _ = build_triangle_bvh(mesh)
    # axis-aligned rays exercise the inf/NaN slab paths
    org = np.zeros((6, 3), np.float32)
    dir = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float32,
    )
    rays = make_rays(org, dir)
    want = brute_force_traverse(mesh, rays)
    got = traverse_triangles(bvh, mesh, rays)
    assert_hits_match(got, want, rays)
    # the open box: +z exits through the opening, misses
    assert not np.asarray(got.hit)[4]
    assert np.asarray(got.hit)[[0, 1, 2, 3, 5]].all()


def test_min_max_t_window():
    mesh = _scene("box")
    bvh, _ = build_triangle_bvh(mesh)
    org = np.array([[0, 0, 0]], np.float32)
    dir = np.array([[0, 0, -1]], np.float32)
    # box wall at z=-1: in-range hits, out-of-range misses
    r_hit = make_rays(org, dir, min_t=0.5, max_t=2.0)
    r_far = make_rays(org, dir, min_t=1.5)
    r_near = make_rays(org, dir, max_t=0.5)
    assert bool(traverse_triangles(bvh, mesh, r_hit).hit[0])
    assert not bool(traverse_triangles(bvh, mesh, r_far).hit[0])
    assert not bool(traverse_triangles(bvh, mesh, r_near).hit[0])


def test_cull_back_face():
    mesh = _scene("sphere")
    bvh, _ = build_triangle_bvh(mesh)
    rays = _random_rays(128, seed=1)
    opt = BVHTraceOptions(cull_back_face=True)
    want = brute_force_traverse(mesh, rays, opt)
    got = traverse_triangles(bvh, mesh, rays, opt)
    assert_hits_match(got, want, rays)
    # culled trace can't produce MORE hits than the uncued one
    plain = traverse_triangles(bvh, mesh, rays)
    assert np.asarray(got.hit).sum() <= np.asarray(plain.hit).sum()


def test_skip_prim_id_per_ray():
    mesh = _scene("sphere")
    bvh, _ = build_triangle_bvh(mesh)
    rays = _random_rays(256, seed=5)
    first = traverse_triangles(bvh, mesh, rays)
    # re-trace skipping each ray's own hit prim: must never return it again
    skip = first.prim_id
    second = traverse_triangles(bvh, mesh, rays, skip_prim_id=skip)
    m = np.asarray(first.hit) & np.asarray(second.hit)
    assert (np.asarray(second.prim_id)[m] != np.asarray(first.prim_id)[m]).all()
    # and must agree with the oracle under the same skip
    want = brute_force_traverse(mesh, rays, skip_prim_id=skip)
    assert_hits_match(second, want, rays)


def test_prim_range_filter():
    mesh = _scene("soup")
    bvh, _ = build_triangle_bvh(mesh)
    rays = _random_rays(256, seed=9)
    opt = BVHTraceOptions(prim_ids_range=(100, 500))
    want = brute_force_traverse(mesh, rays, opt)
    got = traverse_triangles(bvh, mesh, rays, opt)
    assert_hits_match(got, want, rays)
    ids = np.asarray(got.prim_id)[np.asarray(got.hit)]
    assert ((ids >= 100) & (ids < 500)).all()


def test_double_precision():
    v, f = make_uv_sphere(10, 20)
    mesh = TriangleMesh(
        vertices=jnp.asarray(v, jnp.float64), faces=jnp.asarray(f)
    )
    bvh, _ = build_triangle_bvh(mesh)
    rays = _random_rays(128, seed=2, dtype=jnp.float64)
    want = brute_force_traverse(mesh, rays)
    got = traverse_triangles(bvh, mesh, rays)
    assert got.t.dtype == jnp.float64
    assert_hits_match(got, want, rays)


def test_large_leaf_window():
    v, f = make_random_triangles(300, seed=4)
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    opts = BVHBuildOptions(min_leaf_primitives=16, max_leaf_primitives=16)
    bvh, _ = build_triangle_bvh(mesh, opts)
    rays = _random_rays(256, seed=6)
    want = brute_force_traverse(mesh, rays)
    got = traverse_triangles(bvh, mesh, rays, max_leaf=16)
    assert_hits_match(got, want, rays)


def test_2d_ray_batch_shape():
    mesh = _scene("box")
    bvh, _ = build_triangle_bvh(mesh)
    org = np.tile([[0, 0, 0]], (4, 8, 1)).astype(np.float32).reshape(4, 8, 3)
    dir = np.tile([[0, 0, -1]], (32, 1)).astype(np.float32).reshape(4, 8, 3)
    rays = make_rays(org, dir)
    got = traverse_triangles(bvh, mesh, rays)
    assert got.t.shape == (4, 8)
    assert np.asarray(got.hit).all()


def test_deep_degenerate_tree_auto_stack():
    """Overflow safety (ADVICE r1 / VERDICT r1 #6): a depth-99 chain tree
    must traverse correctly with the default auto-sized stack — the old
    fixed 64-slot default silently corrupted results past depth ~62."""
    from nanort_tpu.core.bvh import BVH, max_tree_depth, required_max_stack, stats_from_bvh

    # chain BVH: branch 2j = {leaf(prim j) at 2j+1, branch 2(j+1)};
    # preorder with left == parent+1, contiguous leaf ranges.
    n = 100
    n_nodes = 2 * n - 1
    xs = np.arange(n, dtype=np.float32)
    v = np.zeros((3 * n, 3), np.float32)
    v[0::3] = np.stack([xs, np.full(n, -1.0), np.full(n, -1.0)], -1)
    v[1::3] = np.stack([xs, np.full(n, 1.0), np.full(n, -1.0)], -1)
    v[2::3] = np.stack([xs, np.zeros(n), np.ones(n)], -1)
    f = np.arange(3 * n, dtype=np.int64).reshape(n, 3)
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))

    bmin = np.zeros((n_nodes, 3), np.float32)
    bmax = np.zeros((n_nodes, 3), np.float32)
    flag = np.zeros(n_nodes, np.int32)
    axis = np.zeros(n_nodes, np.int32)
    data = np.zeros((n_nodes, 2), np.uint32)
    for j in range(n - 1):
        b = 2 * j
        bmin[b] = [j, -1, -1]
        bmax[b] = [n - 1, 1, 1]
        data[b] = [b + 1, b + 2]
        lf = b + 1
        flag[lf] = 1
        bmin[lf] = [j, -1, -1]
        bmax[lf] = [j, 1, 1]
        data[lf] = [1, j]
    last = n_nodes - 1
    flag[last] = 1
    bmin[last] = [n - 1, -1, -1]
    bmax[last] = [n - 1, 1, 1]
    data[last] = [1, n - 1]
    bvh = BVH(bmin=bmin, bmax=bmax, flag=flag, axis=axis, data=data,
              indices=np.arange(n, dtype=np.uint32))

    depth = max_tree_depth(bvh)
    assert depth == n - 1
    assert required_max_stack(bvh) >= depth + 4
    assert stats_from_bvh(bvh).max_tree_depth == depth

    # rays along -x: near-first ordering pushes the whole chain before
    # draining leaves, maximizing live stack entries
    org = np.stack(
        [np.full(32, 200.0), np.linspace(-0.5, 0.5, 32), np.zeros(32)], -1
    ).astype(np.float32)
    dirs = np.tile([-1.0, 0, 0], (32, 1)).astype(np.float32)
    rays = make_rays(org, dirs)
    got = traverse_triangles(bvh, mesh, rays)  # default: auto max_stack
    want = brute_force_traverse(mesh, rays)
    assert_hits_match(got, want, rays)

    # the old fixed-64 default must now be demonstrably insufficient here
    bad = traverse_triangles(bvh, mesh, rays, max_stack=8)
    assert not np.array_equal(np.asarray(bad.t), np.asarray(want.t))
