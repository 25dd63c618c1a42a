"""Native C++ builder: invariants + traversal parity vs the NumPy builder."""

import numpy as np
import pytest

from nanort_tpu import BVHBuildOptions, brute_force_traverse, validate
from nanort_tpu.build.native import (
    build_sah_native,
    native_available,
    triangle_bounds_native,
)
from nanort_tpu.build.sah import build_sah
from nanort_tpu.io.procedural import make_random_triangles, make_uv_sphere
from nanort_tpu.ops.triangle import TriangleMesh, triangle_prim_bounds
from nanort_tpu.traverse.stack import traverse_triangles

from test_traverse import _random_rays, assert_hits_match

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no native toolchain"
)


@pytest.mark.parametrize("kind", ["sphere", "soup"])
def test_native_invariants_and_parity(kind):
    if kind == "sphere":
        v, f = make_uv_sphere(14, 28)
    else:
        v, f = make_random_triangles(1500, seed=8)
    mesh = TriangleMesh(vertices=v, faces=f)
    bmin, bmax, ctr = triangle_bounds_native(v, f)
    ref_bmin, ref_bmax, ref_ctr = triangle_prim_bounds(mesh)
    np.testing.assert_allclose(bmin, ref_bmin)
    np.testing.assert_allclose(bmax, ref_bmax)
    np.testing.assert_allclose(ctr, ref_ctr, rtol=1e-6)

    bvh, st = build_sah_native(bmin, bmax, ctr)
    validate(bvh, bmin, bmax, num_prims=len(f))
    assert st.num_leaf_nodes + st.num_branch_nodes == bvh.num_nodes

    rays = _random_rays(512, seed=21)
    want = brute_force_traverse(mesh, rays)
    got = traverse_triangles(bvh, mesh, rays)
    assert_hits_match(got, want, rays)


def test_native_single_prim():
    bmin = np.zeros((1, 3), np.float32)
    bmax = np.ones((1, 3), np.float32)
    bvh, st = build_sah_native(bmin, bmax)
    assert bvh.num_nodes == 1 and bvh.flag[0] == 1


def test_native_identical_centroids():
    v, f = make_random_triangles(64, seed=0, extent=0.0, tri_size=0.1)
    bmin, bmax, ctr = triangle_bounds_native(v, f)
    bvh, _ = build_sah_native(bmin, bmax, ctr)
    validate(bvh, num_prims=64)
    assert bvh.data[bvh.flag == 1, 0].max() <= BVHBuildOptions().max_leaf_primitives


def test_native_quality_comparable_to_numpy():
    # SAH cost of native tree should be within 25% of the numpy builder's
    v, f = make_random_triangles(4000, seed=5)
    mesh = TriangleMesh(vertices=v, faces=f)
    bmin, bmax, ctr = triangle_prim_bounds(mesh)

    def sah_cost(bvh):
        d = np.maximum(np.asarray(bvh.bmax) - np.asarray(bvh.bmin), 0)
        sa = 2 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])
        leaf = np.asarray(bvh.flag) == 1
        return (sa[leaf] * np.asarray(bvh.data)[leaf, 0]).sum() / sa[0]

    b_np, _ = build_sah(bmin, bmax, ctr)
    b_nat, _ = build_sah_native(bmin, bmax, ctr)
    assert sah_cost(b_nat) < sah_cost(b_np) * 1.25
