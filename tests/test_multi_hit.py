"""K-nearest multi-hit traversal vs brute-force oracle.

The reference ships MultiHitTraverse disabled (#if 0, nanort.h:2409-2485,
2694-2797; README TODO). Ours works; these tests are its contract.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nanort_tpu import BVHTraceOptions, build_triangle_bvh, make_rays
from nanort_tpu.io.procedural import (
    make_random_triangles,
    make_uv_sphere,
)
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.multi_hit import (
    brute_force_multi_hit,
    multi_hit_traverse,
    multi_hit_wavefront,
)
from nanort_tpu.traverse.packed import pack_scene

from test_traverse import _random_rays


def _mesh(kind):
    if kind == "sphere":
        v, f = make_uv_sphere(12, 24)
    else:
        v, f = make_random_triangles(600, seed=7)
    return TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))


def assert_multi_match(got, want, rtol=1e-6):
    np.testing.assert_array_equal(
        np.asarray(got.count), np.asarray(want.count)
    )
    gv = np.asarray(got.prim_id) != 0xFFFFFFFF
    wv = np.asarray(want.prim_id) != 0xFFFFFFFF
    np.testing.assert_array_equal(gv, wv)
    np.testing.assert_array_equal(
        np.asarray(got.prim_id)[gv], np.asarray(want.prim_id)[wv]
    )
    np.testing.assert_allclose(
        np.asarray(got.t)[gv], np.asarray(want.t)[wv], rtol=rtol
    )
    np.testing.assert_allclose(
        np.asarray(got.u)[gv], np.asarray(want.u)[wv], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.v)[gv], np.asarray(want.v)[wv], rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("kind", ["sphere", "soup"])
@pytest.mark.parametrize("engine", ["stack", "wavefront"])
def test_multi_hit_matches_oracle(kind, engine):
    mesh = _mesh(kind)
    rays = _random_rays(333, seed=21)
    K = 8
    want = brute_force_multi_hit(mesh, rays, K)
    assert int(np.asarray(want.count).max()) >= 2  # scene has multi-hits
    bvh, _ = build_triangle_bvh(mesh)
    if engine == "stack":
        got = multi_hit_traverse(bvh, mesh, rays, K)
    else:
        scene = pack_scene(bvh, mesh.vertices, mesh.faces)
        got = multi_hit_wavefront(scene, rays, K, tile=128)
    assert_multi_match(got, want)


def test_multi_hit_sorted_and_k_truncates():
    mesh = _mesh("sphere")
    # central rays pierce the sphere twice
    org = np.tile([0, 0, 5.0], (9, 1)).astype(np.float32)
    dirs = np.tile([0, 0, -1.0], (9, 1)).astype(np.float32)
    org[:, 0] = np.linspace(-0.3, 0.3, 9)
    rays = make_rays(org, dirs)
    bvh, _ = build_triangle_bvh(mesh)
    got = multi_hit_traverse(bvh, mesh, rays, max_intersections=4)
    t = np.asarray(got.t)
    c = np.asarray(got.count)
    assert (c >= 2).all()
    for i in range(9):
        tv = t[i, : c[i]]
        assert (np.diff(tv) >= 0).all()  # ascending
        assert (t[i, c[i]:] == np.finfo(np.float32).max).all()

    # K=1 equals the single-hit engine's nearest hit
    from nanort_tpu import traverse_triangles

    one = multi_hit_traverse(bvh, mesh, rays, max_intersections=1)
    single = traverse_triangles(bvh, mesh, rays)
    np.testing.assert_allclose(
        np.asarray(one.t)[:, 0], np.asarray(single.t), rtol=1e-6
    )

    # K larger than available hits: extra slots empty
    k16 = multi_hit_traverse(bvh, mesh, rays, max_intersections=16)
    np.testing.assert_array_equal(np.asarray(k16.count), c)


def test_multi_hit_options_filters():
    mesh = _mesh("soup")
    rays = _random_rays(128, seed=4)
    opt = BVHTraceOptions(prim_ids_range=(50, 400), cull_back_face=True)
    bvh, _ = build_triangle_bvh(mesh)
    want = brute_force_multi_hit(mesh, rays, 6, opt)
    got = multi_hit_traverse(bvh, mesh, rays, 6, opt)
    assert_multi_match(got, want)
    pid = np.asarray(got.prim_id)
    valid = pid != 0xFFFFFFFF
    assert ((pid[valid] >= 50) & (pid[valid] < 400)).all()


def test_multi_hit_wavefront_multi_mesh_roots():
    from nanort_tpu.traverse.packed import pack_scene_multi

    items = []
    meshes = []
    for z in (-5.0, -2.0, -3.5):
        v = np.array([[-2, -2, z], [2, -2, z], [0, 2, z]], np.float32)
        f = np.array([[0, 1, 2]], np.int64)
        m = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
        bvh, _ = build_triangle_bvh(m)
        items.append((bvh, v, f))
        meshes.append(m)
    scene, roots = pack_scene_multi(items)
    rays = make_rays(
        np.zeros((3, 3), np.float32),
        np.tile([0, 0, -1.0], (3, 1)).astype(np.float32),
    )
    root = jnp.asarray(np.asarray(roots, np.int32))
    got = multi_hit_wavefront(scene, rays, 4, root=root, tile=8)
    # each ray rooted at mesh k sees exactly its own triangle
    np.testing.assert_array_equal(np.asarray(got.count), [1, 1, 1])
    np.testing.assert_allclose(
        np.asarray(got.t)[:, 0], [5.0, 2.0, 3.5], rtol=1e-6
    )
