"""Device-side LBVH builder: invariants + traversal parity vs oracle."""

import numpy as np
import pytest

from nanort_tpu import brute_force_traverse, traverse_triangles, validate
from nanort_tpu.build.lbvh import build_lbvh, morton_codes
from nanort_tpu.io.procedural import make_random_triangles, make_uv_sphere
from nanort_tpu.ops.triangle import TriangleMesh, triangle_prim_bounds

from test_traverse import _random_rays, assert_hits_match
import jax.numpy as jnp


def test_morton_ordering():
    import jax.numpy as jnp

    c = jnp.asarray([[0, 0, 0], [1, 1, 1], [0.5, 0.5, 0.5]], jnp.float32)
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    m = np.asarray(morton_codes(c, lo, hi))
    assert m[0] < m[2] < m[1]


@pytest.mark.parametrize("kind", ["sphere", "soup"])
def test_lbvh_invariants(kind):
    if kind == "sphere":
        v, f = make_uv_sphere(14, 28)
    else:
        v, f = make_random_triangles(2000, seed=7)
    mesh = TriangleMesh(vertices=v, faces=f)
    bmin, bmax, ctr = triangle_prim_bounds(mesh)
    bvh, st = build_lbvh(bmin, bmax, ctr)
    validate(bvh, bmin, bmax, num_prims=len(f))
    assert st.num_leaf_nodes + st.num_branch_nodes == bvh.num_nodes
    counts = bvh.data[bvh.flag == 1, 0]
    assert counts.max() <= 4


@pytest.mark.parametrize("kind", ["sphere", "soup"])
def test_lbvh_traversal_parity(kind):
    if kind == "sphere":
        v, f = make_uv_sphere(12, 24)
    else:
        v, f = make_random_triangles(900, seed=2)
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bmin, bmax, ctr = triangle_prim_bounds(mesh)
    bvh, _ = build_lbvh(bmin, bmax, ctr)
    rays = _random_rays(512, seed=31)
    want = brute_force_traverse(mesh, rays)
    got = traverse_triangles(bvh, mesh, rays)
    assert_hits_match(got, want, rays)


def test_lbvh_duplicate_centroids():
    # all-identical centroids: duplicate morton codes exercise the index
    # tiebreak path
    v, f = make_random_triangles(128, seed=0, extent=0.0, tri_size=0.05)
    mesh = TriangleMesh(vertices=v, faces=f)
    bmin, bmax, ctr = triangle_prim_bounds(mesh)
    ctr0 = np.zeros_like(ctr)  # force identical codes
    bvh, _ = build_lbvh(bmin, bmax, ctr0)
    validate(bvh, num_prims=128)


def test_lbvh_tiny():
    v, f = make_random_triangles(3, seed=1)
    mesh = TriangleMesh(vertices=v, faces=f)
    bmin, bmax, ctr = triangle_prim_bounds(mesh)
    bvh, _ = build_lbvh(bmin, bmax, ctr)
    assert bvh.num_nodes == 1 and bvh.flag[0] == 1


def test_topology_from_arbitrary_deltas():
    """_topology_from_deltas generalizes Karras to ANY delta array:
    hybrid_deltas' negative agglomerative boundary overrides must still
    yield a valid contiguous-range binary tree under the endpoint-index
    bijection (root at 0, children at split/split+1)."""
    import jax.numpy as jnp

    from nanort_tpu.build.lbvh import (
        _topology_from_deltas, hybrid_deltas, morton_codes,
    )
    from nanort_tpu.io.procedural import make_random_triangles

    v, f = make_random_triangles(5000, seed=7)
    v = jnp.asarray(v)
    f = jnp.asarray(f)
    v0, v1, v2 = (jnp.take(v, f[:, k], axis=0) for k in range(3))
    lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    n = int(f.shape[0])
    codes = morton_codes(0.5 * (lo + hi), lo.min(0), hi.max(0))
    order = jnp.argsort(codes).astype(jnp.int32)
    codes_s = jnp.take(codes, order)
    slo = jnp.take(lo, order, axis=0)
    shi = jnp.take(hi, order, axis=0)

    D = np.asarray(hybrid_deltas(codes_s, slo, shi, n, C=32))
    # every cluster boundary got a negative override (the agglomeration
    # terminated and consumed all boundaries)
    bidx = (np.arange(-(-n // 32) - 1) + 1) * 32 - 1
    assert (D[bidx] < 0).all()
    assert D.min() >= -120

    first, last, split = (
        np.asarray(x) for x in _topology_from_deltas(jnp.asarray(D), n))
    assert first[0] == 0 and last[0] == n - 1
    assert ((first <= split) & (split < last)).all()
    for i in np.random.default_rng(0).choice(n - 1, 1500, replace=False):
        s = split[i]
        if s > first[i]:
            assert first[s] == first[i] and last[s] == s
        if s + 1 < last[i]:
            assert first[s + 1] == s + 1 and last[s + 1] == last[i]
