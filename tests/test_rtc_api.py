"""Embree-style front end: the reference shim's call sequence, batched."""

import numpy as np
import pytest

from nanort_tpu import make_rays
from nanort_tpu.api.rtc import BufferType, new_device
from nanort_tpu.io.procedural import make_uv_sphere


def _fill_sphere(scene, radius=1.0, center=(0, 0, 0)):
    v, f = make_uv_sphere(10, 20, radius, center)
    gid = scene.new_triangle_mesh(len(f), len(v))
    scene.map_buffer(gid, BufferType.VERTEX)[:] = v
    scene.map_buffer(gid, BufferType.INDEX)[:] = f
    return gid


def test_embree_call_sequence():
    device = new_device()
    scene = device.new_scene()
    gid0 = _fill_sphere(scene, 0.5, (-1.5, 0, 0))
    gid1 = _fill_sphere(scene, 0.5, (1.5, 0, 0))
    scene.commit()

    lo, hi = scene.bounds()
    np.testing.assert_allclose(lo, [-2, -0.5, -0.5], atol=1e-5)
    np.testing.assert_allclose(hi, [2, 0.5, 0.5], atol=1e-5)

    rays = make_rays(
        np.array([[-1.5, 0, 5], [1.5, 0, 5], [0, 0, 5]], np.float32),
        np.tile([0, 0, -1.0], (3, 1)).astype(np.float32),
    )
    hits = scene.intersect(rays)
    h = np.asarray(hits.hit)
    assert h[0] and h[1] and not h[2]
    assert int(hits.node_id[0]) == gid0 and int(hits.node_id[1]) == gid1
    assert int(hits.node_id[2]) == 0xFFFFFFFF  # RTC_INVALID_GEOMETRY_ID

    occ = np.asarray(scene.occluded(rays))
    assert occ[0] and occ[1] and not occ[2]


def test_geom_id_freelist_and_rebuild():
    device = new_device()
    scene = device.new_scene()
    g0 = _fill_sphere(scene, 0.5, (-2, 0, 0))
    g1 = _fill_sphere(scene, 0.5, (2, 0, 0))
    scene.delete_geometry(g0)
    g2 = _fill_sphere(scene, 0.5, (0, 0, 0))
    assert g2 == g0  # free-list reuse like the reference HandleAllocator
    scene.commit()
    rays = make_rays(
        np.array([[0, 0, 5]], np.float32), np.array([[0, 0, -1.0]], np.float32)
    )
    hits = scene.intersect(rays)
    assert bool(hits.hit[0]) and int(hits.node_id[0]) == g2


def test_uncommitted_raises():
    device = new_device()
    scene = device.new_scene()
    _fill_sphere(scene)
    rays = make_rays(np.zeros((1, 3), np.float32), np.array([[0, 0, 1.0]], np.float32))
    with pytest.raises(RuntimeError):
        scene.intersect(rays)
    with pytest.raises(ValueError):
        device.new_scene().commit()


def test_set_transform():
    device = new_device()
    scene = device.new_scene()
    gid = _fill_sphere(scene, 1.0)
    from nanort_tpu.scene import matrix as mat

    scene.set_transform(gid, mat.translate([0, 3, 0]))
    scene.commit()
    rays = make_rays(
        np.array([[0, 3, 5], [0, 0, 5]], np.float32),
        np.tile([0, 0, -1.0], (2, 1)).astype(np.float32),
    )
    hits = scene.intersect(rays)
    assert bool(hits.hit[0]) and not bool(hits.hit[1])


def test_fast_commit_gating():
    # on the CPU test backend commit() must NOT build packet tables
    # (the Pallas kernel is TPU-only); explicit fast=False likewise
    import numpy as np
    from nanort_tpu.io.procedural import make_uv_sphere

    v, f = make_uv_sphere(6, 12)
    dev = new_device()
    sc = dev.new_scene()
    gid = sc.new_triangle_mesh(len(f), len(v))
    sc.map_buffer(gid, BufferType.VERTEX)[:] = v
    sc.map_buffer(gid, BufferType.INDEX)[:] = f
    sc.commit()
    assert sc._scene8 is None
    sc.commit(fast=False)
    assert sc._scene8 is None


def test_two_geometries_overlapping_footprint():
    """Regression (ADVICE r1): >= 2 geometries where a ray drains the
    last leaf of geometry 0's subtree with geometry 1 directly behind it
    in table order — hits must not leak across geometries."""
    device = new_device()
    scene = device.new_scene()
    # geom 0: single triangle at z=-5; geom 1: single triangle at z=-2
    for z in (-5.0, -2.0):
        v = np.array([[-2, -2, z], [2, -2, z], [0, 2, z]], np.float32)
        f = np.array([[0, 1, 2]], np.int32)
        gid = scene.new_triangle_mesh(1, 3)
        scene.map_buffer(gid, BufferType.VERTEX)[:] = v
        scene.map_buffer(gid, BufferType.INDEX)[:] = f
    scene.commit()
    rays = make_rays(
        np.array([[0, 0, 0]], np.float32), np.array([[0, 0, -1.0]], np.float32)
    )
    hits = scene.intersect(rays)
    assert bool(hits.hit[0])
    assert float(hits.t[0]) == pytest.approx(2.0, rel=1e-6)
    assert int(hits.node_id[0]) == 1


def test_fast_tables_bake_transforms():
    # fast commit must build the occlusion BVH over WORLD-space
    # geometry: a transformed instance's triangles appear transformed
    # in the flattened packet-kernel tables
    from nanort_tpu.io.procedural import make_uv_sphere
    from nanort_tpu.scene import matrix as mat

    v, f = make_uv_sphere(4, 8)
    dev = new_device()
    sc = dev.new_scene()
    gid = sc.new_triangle_mesh(len(f), len(v))
    sc.map_buffer(gid, BufferType.VERTEX)[:] = v
    sc.map_buffer(gid, BufferType.INDEX)[:] = f
    off = np.array([10.0, -2.0, 3.0], np.float32)
    sc.set_transform(gid, mat.translate(off))
    sc.commit(fast=True)
    assert sc._scene8 is not None
    leafs = np.asarray(sc._scene8.leafs)
    # every stored leaf triangle vertex lies inside the translated bbox
    tri = leafs[:, :90].reshape(-1, 10, 9)[..., :9].reshape(-1, 3)
    live = np.abs(tri).sum(axis=1) > 0
    lo = v.min(axis=0) + off - 1e-4
    hi = v.max(axis=0) + off + 1e-4
    assert np.all((tri[live] >= lo) & (tri[live] <= hi))


def test_fast_intersect_remaps_geom_and_local_prim(monkeypatch):
    """The packet-kernel closest-hit path (commit(fast=True)) must return
    the same (geom id, LOCAL prim id, t, normals) as the scene-graph walk
    (reference rtcIntersect fills geomID/primID, nanort-embree.cc:515-554).
    The Pallas kernel is stubbed with the numpy BVH8 walker on CPU."""
    from test_treelet import _fake_traverse_bvh8

    from nanort_tpu.traverse import pallas_packet as _pp

    monkeypatch.setattr(_pp, "traverse_bvh8", _fake_traverse_bvh8)

    from nanort_tpu.io.procedural import make_uv_sphere

    device = new_device()
    scene = device.new_scene()
    # geom 0: two triangles at z=-5; geom 1: sphere in front
    v0 = np.array(
        [[-2, -2, -5], [2, -2, -5], [0, 2, -5], [3, 3, -5]], np.float32
    )
    f0 = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    g0 = scene.new_triangle_mesh(len(f0), len(v0))
    scene.map_buffer(g0, BufferType.VERTEX)[:] = v0
    scene.map_buffer(g0, BufferType.INDEX)[:] = f0
    v1, f1 = make_uv_sphere(8, 16, 0.8)
    g1 = scene.new_triangle_mesh(len(f1), len(v1))
    scene.map_buffer(g1, BufferType.VERTEX)[:] = v1
    scene.map_buffer(g1, BufferType.INDEX)[:] = f1
    scene.commit(fast=True)
    assert scene._scene8 is not None and scene._flat_pack is not None

    rng = np.random.default_rng(12)
    org = (rng.uniform(-1.5, 1.5, (32, 3)) * [1, 1, 0]).astype(np.float32)
    org[:, 2] = 3.0
    d = np.zeros((32, 3), np.float32)
    d[:, 2] = -1.0
    rays = make_rays(org, d)

    fast = scene.intersect(rays)
    slow = scene._sg.traverse(rays)
    # slow path's node ids are instance indices == geom ids here
    fh = np.asarray(fast.hit)
    sh = np.asarray(slow.hit)
    assert (fh == sh).all()
    assert fh.any() and (~fh).any()  # both classes exercised
    m = fh
    assert (np.asarray(fast.node_id)[m] == np.asarray(slow.node_id)[m]).all()
    assert (np.asarray(fast.prim_id)[m] == np.asarray(slow.prim_id)[m]).all()
    np.testing.assert_allclose(
        np.asarray(fast.t)[m], np.asarray(slow.t)[m], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fast.normal_g)[m], np.asarray(slow.normal_g)[m],
        rtol=1e-4, atol=1e-5,
    )
    # local prim ids must stay in range for the sphere geometry
    sphere = np.asarray(fast.node_id)[m] == g1
    assert (np.asarray(fast.prim_id)[m][sphere] < len(f1)).all()
