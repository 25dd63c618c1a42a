"""Two-level scene graph (NanoSG equivalent): instancing + transforms."""

import numpy as np
import jax.numpy as jnp
import pytest

from nanort_tpu import build_triangle_bvh, make_rays, traverse_triangles
from nanort_tpu.io.procedural import make_cornell_box, make_uv_sphere
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.scene import matrix as mat
from nanort_tpu.scene.graph import Node, Scene


def _sphere_mesh(r=1.0):
    v, f = make_uv_sphere(10, 20, r)
    return TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))


def _rays_grid(n, z=5.0, span=2.5):
    xs = np.linspace(-span, span, n, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    org = np.stack([gx, gy, np.full((n, n), z, np.float32)], -1)
    d = np.zeros_like(org)
    d[..., 2] = -1.0
    return make_rays(org.reshape(-1, 3), d.reshape(-1, 3))


def test_identity_instance_matches_flat_traversal():
    mesh = _sphere_mesh()
    sc = Scene()
    sc.add_node(Node("ball", mesh))
    sc.commit()
    rays = _rays_grid(24)
    got = sc.traverse(rays)
    bvh, _ = build_triangle_bvh(mesh)
    want = traverse_triangles(bvh, mesh, rays)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    m = np.asarray(want.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[m], np.asarray(want.t)[m], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.prim_id)[m], np.asarray(want.prim_id)[m]
    )
    assert (np.asarray(got.node_id)[m] == 0).all()


def test_translated_instances():
    mesh = _sphere_mesh(0.5)
    sc = Scene()
    sc.add_node(Node("left", mesh, mat.translate([-1.5, 0, 0])))
    sc.add_node(Node("right", mesh, mat.translate([1.5, 0, 0])))
    sc.commit()
    rays = make_rays(
        np.array([[-1.5, 0, 5], [1.5, 0, 5], [0, 0, 5]], np.float32),
        np.tile([0, 0, -1.0], (3, 1)).astype(np.float32),
    )
    h = sc.traverse(rays)
    hits = np.asarray(h.hit)
    assert hits[0] and hits[1] and not hits[2]
    assert np.asarray(h.node_id)[0] == 0 and np.asarray(h.node_id)[1] == 1
    np.testing.assert_allclose(np.asarray(h.t)[:2], [4.5, 4.5], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h.position)[0], [-1.5, 0, 0.5], atol=1e-5
    )


def test_scaled_instance_world_distance():
    mesh = _sphere_mesh(1.0)
    sc = Scene()
    sc.add_node(Node("big", mesh, mat.scale(2.0)))
    sc.commit()
    rays = make_rays(
        np.array([[0, 0, 5]], np.float32), np.array([[0, 0, -1.0]], np.float32)
    )
    h = sc.traverse(rays)
    assert bool(h.hit[0])
    # sphere scaled to radius 2 -> hit at z=2 -> world t=3
    np.testing.assert_allclose(float(h.t[0]), 3.0, rtol=2e-3)
    # normal transform: must point back toward the ray (+z), unit length
    ng = np.asarray(h.normal_g)[0]
    assert abs(np.linalg.norm(ng) - 1) < 1e-5 and abs(abs(ng[2]) - 1) < 5e-2  # coarse-facet normal


def test_nested_transforms():
    mesh = _sphere_mesh(0.5)
    sc = Scene()
    parent = sc.add_node(Node("group", None, mat.translate([0, 2, 0])))
    parent.add_child(Node("ball", mesh, mat.translate([1, 0, 0])))
    sc.commit()
    rays = make_rays(
        np.array([[1, 2, 5]], np.float32), np.array([[0, 0, -1.0]], np.float32)
    )
    h = sc.traverse(rays)
    assert bool(h.hit[0])
    np.testing.assert_allclose(np.asarray(h.position)[0], [1, 2, 0.5], atol=1e-5)


def test_rotated_instance():
    # squash a sphere then rotate: checks inv_xform + normal transform
    mesh = _sphere_mesh(1.0)
    sc = Scene()
    xf = mat.compose(mat.rotate([0, 0, 1], np.pi / 2), mat.scale([2.0, 0.5, 1.0]))
    sc.add_node(Node("rot", mesh, xf))
    sc.commit()
    # after scale(2,0.5,1) + rot z 90deg: extents x=0.5, y=2
    rays = make_rays(
        np.array([[0, 0, 5], [1.0, 0, 5], [0, 1.5, 5]], np.float32),
        np.tile([0, 0, -1.0], (3, 1)).astype(np.float32),
    )
    h = sc.traverse(rays)
    hits = np.asarray(h.hit)
    assert hits[0] and not hits[1] and hits[2]


def test_find_node_and_bbox():
    mesh = _sphere_mesh(1.0)
    sc = Scene()
    g = sc.add_node(Node("group"))
    g.add_child(Node("inner", mesh, mat.translate([3, 0, 0])))
    assert sc.find_node("inner") is not None
    assert sc.find_node("nope") is None
    sc.commit()
    lo, hi = sc.bounding_box()
    np.testing.assert_allclose(lo, [2, -1, -1], atol=1e-5)
    np.testing.assert_allclose(hi, [4, 1, 1], atol=1e-5)


def test_many_instances_nearest_wins():
    mesh = _sphere_mesh(0.4)
    sc = Scene()
    for i in range(12):
        sc.add_node(Node(f"s{i}", mesh, mat.translate([0, 0, -float(i)])))
    sc.commit()
    rays = make_rays(
        np.array([[0, 0, 5]], np.float32), np.array([[0, 0, -1.0]], np.float32)
    )
    h = sc.traverse(rays)
    assert bool(h.hit[0])
    assert int(h.node_id[0]) == 0  # nearest instance at z=0
    np.testing.assert_allclose(float(h.t[0]), 4.6, rtol=1e-5)


def test_empty_scene_raises():
    sc = Scene()
    with pytest.raises(ValueError):
        sc.commit()


def _single_tri_mesh(z):
    v = np.array([[-2, -2, z], [2, -2, z], [0, 2, z]], np.float32)
    f = np.array([[0, 1, 2]], np.int64)
    return TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))


def test_two_distinct_meshes_no_subtree_leak():
    """Regression (ADVICE r1): a Scene with >= 2 DISTINCT meshes must not
    let a ray rooted in mesh 0's subtree drain through into mesh 1's
    nodes (wavefront multi-mesh table leak). Hits must attribute to the
    right instance."""
    far = _single_tri_mesh(-5.0)   # node 0
    near = _single_tri_mesh(-2.0)  # node 1
    sc = Scene()
    sc.add_node(Node("far", far))
    sc.add_node(Node("near", near))
    sc.commit()
    rays = make_rays(
        np.array([[0, 0, 0]], np.float32), np.array([[0, 0, -1.0]], np.float32)
    )
    h = sc.traverse(rays)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-6)
    assert int(h.node_id[0]) == 1  # nearest instance is "near"


def test_multi_distinct_meshes_match_flat_traversal():
    """Scene of several distinct meshes (identity transforms) must equal
    single-BVH traversal over the concatenated geometry."""
    from nanort_tpu.io.procedural import merge_meshes

    v0, f0 = make_uv_sphere(8, 16, 0.6, (-1.2, 0, 0))
    v1, f1 = make_cornell_box()
    v2, f2 = make_uv_sphere(6, 12, 0.4, (1.2, 0.3, 0))
    sc = Scene()
    for i, (v, f) in enumerate([(v0, f0), (v1, f1), (v2, f2)]):
        sc.add_node(
            Node(f"m{i}", TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f)))
        )
    sc.commit()

    mv, mf = merge_meshes((v0, f0), (v1, f1), (v2, f2))
    flat = TriangleMesh(vertices=jnp.asarray(mv), faces=jnp.asarray(mf))
    bvh, _ = build_triangle_bvh(flat)

    rays = _rays_grid(20, z=4.0, span=1.8)
    got = sc.traverse(rays)
    want = traverse_triangles(bvh, flat, rays)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    m = np.asarray(want.hit)
    assert m.any()
    np.testing.assert_allclose(
        np.asarray(got.t)[m], np.asarray(want.t)[m], rtol=1e-4, atol=1e-5
    )


def test_interactive_node_edit_recommit(monkeypatch):
    """The gizmo path (VERDICT r4 #7): commit -> move a named node ->
    re-commit -> hits move with it, and the re-commit reuses every
    cached mesh BVH (reference lazy-build-once semantics,
    nanosg.h:409-443 — transform edits only recompose matrices)."""
    sc = Scene()
    sc.add_node(Node("ball", _sphere_mesh(0.5)))
    box_v, box_f = make_cornell_box(2.0)
    sc.add_node(Node("box", TriangleMesh(
        vertices=jnp.asarray(box_v), faces=jnp.asarray(box_f))))
    sc.commit()

    rays = _rays_grid(16, z=4.0, span=0.4)  # tight bundle through center
    h0 = sc.traverse(rays)
    ball0 = np.asarray(h0.node_id) == 0
    assert ball0.any(), "center rays must see the ball"

    # move the ball out of the bundle; count builds during re-commit
    import nanort_tpu

    calls = {"n": 0}
    real_build = nanort_tpu.build_triangle_bvh

    def counting(*a, **k):
        calls["n"] += 1
        return real_build(*a, **k)

    monkeypatch.setattr(nanort_tpu, "build_triangle_bvh", counting)
    node = sc.find_node("ball")
    node.translate(dx=5.0)
    sc.commit()
    assert calls["n"] == 0, "transform-only re-commit must not rebuild"

    h1 = sc.traverse(rays)
    ball1 = np.asarray(h1.node_id) == 0
    assert not ball1.any(), "moved ball must leave the bundle"
    # the rays now reach the box wall behind it
    assert (np.asarray(h1.t)[ball0] > np.asarray(h0.t)[ball0]).all()

    # move it back: hits return exactly (same cached BVH, same records)
    node.translate(dx=-5.0)
    sc.commit()
    h2 = sc.traverse(rays)
    np.testing.assert_array_equal(
        np.asarray(h2.node_id), np.asarray(h0.node_id))
    np.testing.assert_allclose(
        np.asarray(h2.t), np.asarray(h0.t), rtol=1e-6)
