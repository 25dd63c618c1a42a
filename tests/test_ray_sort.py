"""Ray sorting: identical hits, any order."""

import jax.numpy as jnp
import numpy as np

from nanort_tpu import build_triangle_bvh, make_rays
from nanort_tpu.io.procedural import make_uv_sphere
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.ray_sort import ray_sort_keys, sort_rays
from nanort_tpu.traverse.stack import traverse_triangles


def test_sort_unsort_roundtrip():
    rng = np.random.default_rng(0)
    org = rng.uniform(-2, 2, (333, 3)).astype(np.float32)
    d = rng.normal(size=(333, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(org, d)
    sorted_rays, order, unsort = sort_rays(rays, [-2, -2, -2], [2, 2, 2])
    # unsort(sorted) == original
    back = unsort(sorted_rays)
    np.testing.assert_array_equal(np.asarray(back.org), org)
    # keys of the sorted stream are monotone
    keys = np.asarray(ray_sort_keys(sorted_rays, [-2, -2, -2], [2, 2, 2]))
    assert (np.diff(keys.astype(np.int64)) >= 0).all()


def test_sorted_traversal_matches():
    v, f = make_uv_sphere(12, 24)
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh)
    rng = np.random.default_rng(3)
    org = rng.uniform(-3, 3, (500, 3)).astype(np.float32)
    d = -org + rng.uniform(-0.5, 0.5, (500, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(org, d.astype(np.float32))
    want = traverse_triangles(bvh, mesh, rays)
    sorted_rays, order, unsort = sort_rays(rays, org.min(0), org.max(0))
    got = unsort(traverse_triangles(bvh, mesh, sorted_rays))
    np.testing.assert_array_equal(np.asarray(got.prim_id), np.asarray(want.prim_id))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(want.t))
