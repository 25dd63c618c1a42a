"""Wavefront skip-link traversal parity vs stack traversal and oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from nanort_tpu import (
        BVHTraceOptions,
    brute_force_traverse,
    build_triangle_bvh,
    make_rays,
)
from nanort_tpu.io.procedural import (
    make_cornell_box,
    make_random_triangles,
    make_uv_sphere,
    merge_meshes,
)
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.packed import pack_scene
from nanort_tpu.traverse.wavefront import traverse_wavefront

from test_traverse import _random_rays, assert_hits_match


def _packed(kind):
    if kind == "box":
        v, f = make_cornell_box()
    elif kind == "sphere":
        v, f = make_uv_sphere(12, 24)
    elif kind == "mixed":
        v, f = merge_meshes(make_cornell_box(), make_uv_sphere(10, 20, 0.5))
    else:
        v, f = make_random_triangles(800, seed=11)
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh)
    return mesh, pack_scene(bvh, v, f)


@pytest.mark.parametrize("kind", ["box", "sphere", "mixed", "soup"])
def test_wavefront_matches_oracle(kind):
    mesh, scene = _packed(kind)
    rays = _random_rays(777, seed=13)  # odd count exercises tile padding
    want = brute_force_traverse(mesh, rays)
    got = traverse_wavefront(scene, rays, tile=256)
    assert np.asarray(want.hit).any()
    assert_hits_match(got, want, rays)


def test_wavefront_options_and_skip():
    mesh, scene = _packed("sphere")
    rays = _random_rays(256, seed=3)
    opt = BVHTraceOptions(cull_back_face=True, prim_ids_range=(10, 400))
    want = brute_force_traverse(mesh, rays, opt)
    got = traverse_wavefront(scene, rays, opt, tile=128)
    assert_hits_match(got, want, rays)

    first = traverse_wavefront(scene, rays, tile=128)
    second = traverse_wavefront(
        scene, rays, skip_prim_id=first.prim_id, tile=128
    )
    want2 = brute_force_traverse(mesh, rays, skip_prim_id=first.prim_id)
    assert_hits_match(second, want2, rays)


def test_wavefront_2d_batch_and_window():
    mesh, scene = _packed("box")
    org = np.zeros((4, 8, 3), np.float32)
    dir = np.tile([0, 0, -1.0], (4, 8, 1)).astype(np.float32)
    rays = make_rays(org, dir, min_t=0.5, max_t=2.0)
    got = traverse_wavefront(scene, rays, tile=16)
    assert got.t.shape == (4, 8)
    assert np.asarray(got.hit).all()
    rays2 = make_rays(org, dir, max_t=0.5)
    got2 = traverse_wavefront(scene, rays2, tile=16)
    assert not np.asarray(got2.hit).any()


def _tri_mesh(z, shift=0.0):
    v = np.array(
        [[-1 + shift, -1, z], [1 + shift, -1, z], [0 + shift, 1, z]],
        np.float32,
    )
    f = np.array([[0, 1, 2]], np.int64)
    return v, f


def test_multi_mesh_last_leaf_does_not_leak():
    """Regression (ADVICE r1, high): after draining the LAST leaf of mesh
    k's subtree, the ray must escape via the leaf's remapped skip (global
    sentinel), not fall through to mesh k+1's root at cur+1."""
    from nanort_tpu.traverse.packed import pack_scene_multi

    v0, f0 = _tri_mesh(-5.0)  # mesh 0: triangle at z=-5 (t=5)
    v1, f1 = _tri_mesh(-2.0)  # mesh 1: nearer triangle at z=-2 (t=2)
    items = []
    for v, f in [(v0, f0), (v1, f1)]:
        mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
        bvh, _ = build_triangle_bvh(mesh)
        items.append((bvh, v, f))
    scene, roots = pack_scene_multi(items)

    rays = make_rays(
        np.zeros((2, 3), np.float32),
        np.tile([0, 0, -1.0], (2, 1)).astype(np.float32),
    )
    root = jnp.asarray(np.asarray([roots[0], roots[1]], np.int32))
    got = traverse_wavefront(scene, rays, root=root, tile=8)
    # ray 0 rooted at mesh 0 must see ONLY mesh 0's triangle (t=5)
    np.testing.assert_allclose(float(got.t[0]), 5.0, rtol=1e-6)
    assert int(got.prim_id[0]) == 0
    # ray 1 rooted at mesh 1 sees its own triangle at t=2
    np.testing.assert_allclose(float(got.t[1]), 2.0, rtol=1e-6)


def test_multi_mesh_roots_match_per_mesh_traversal():
    """Randomized multi-mesh table: rays rooted at each sub-tree must
    reproduce that mesh's standalone traversal exactly."""
    from nanort_tpu.traverse.packed import pack_scene_multi

    rng = np.random.default_rng(5)
    meshes = []
    items = []
    for k in range(3):
        v, f = make_random_triangles(120 + 70 * k, seed=20 + k)
        mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
        bvh, _ = build_triangle_bvh(mesh)
        meshes.append(mesh)
        items.append((bvh, v, f))
    scene, roots = pack_scene_multi(items)

    rays = _random_rays(257, seed=9)
    for k, mesh in enumerate(meshes):
        root = jnp.full((257,), int(roots[k]), jnp.int32)
        got = traverse_wavefront(scene, rays, root=root, tile=64)
        want = brute_force_traverse(mesh, rays)
        assert np.asarray(want.hit).any()
        assert_hits_match(got, want, rays)
