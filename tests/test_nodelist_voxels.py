"""ListNodeIntersections parity + voxel meshing."""

import jax.numpy as jnp
import numpy as np

from nanort_tpu import BVHBuildOptions, build_triangle_bvh, make_rays
from nanort_tpu.io.voxels import grid2d_to_boxes, voxels_to_mesh
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.stack import list_node_intersections, traverse_triangles
from nanort_tpu.build.sah import build_sah


def test_list_node_intersections_sorted():
    # a "top-level" BVH over 5 instance AABBs along z (min_leaf=1)
    n = 5
    bmin = np.array([[-1, -1, -2.0 * i - 1] for i in range(n)], np.float32)
    bmax = np.array([[1, 1, -2.0 * i + 0.5] for i in range(n)], np.float32)
    bvh, _ = build_sah(bmin, bmax, options=BVHBuildOptions(min_leaf_primitives=1))
    rays = make_rays(
        np.array([[0, 0, 5], [0, 5, 5]], np.float32),
        np.tile([0, 0, -1.0], (2, 1)).astype(np.float32),
    )
    tmin, tmax, ids = list_node_intersections(bvh, rays, max_intersections=4)
    assert ids.shape == (2, 4)
    r0 = np.asarray(ids[0])
    assert (r0 != 0xFFFFFFFF).all()  # 4 nearest of 5 boxes
    t0 = np.asarray(tmin[0])
    assert (np.diff(t0) > 0).all()  # sorted front to back
    # leaf node ids point at leaves of the bvh
    assert (np.asarray(bvh.flag)[r0] == 1).all()
    # second ray misses everything
    assert (np.asarray(ids[1]) == 0xFFFFFFFF).all()


def test_voxels_hidden_faces_removed():
    occ = np.ones((2, 1, 1), bool)
    v, f = voxels_to_mesh(occ)
    # two touching cubes: 2*6 - 2 shared = 10 quads = 20 tris
    assert len(f) == 20


def test_voxel_mesh_raytrace():
    occ = np.zeros((3, 3, 3), bool)
    occ[1, 1, 1] = True
    v, f = voxels_to_mesh(occ)
    assert len(f) == 12
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh)
    rays = make_rays(
        np.array([[1.5, 1.5, 10], [0.5, 0.5, 10]], np.float32),
        np.tile([0, 0, -1.0], (2, 1)).astype(np.float32),
    )
    h = traverse_triangles(bvh, mesh, rays)
    hits = np.asarray(h.hit)
    assert hits[0] and not hits[1]
    np.testing.assert_allclose(float(h.t[0]), 8.0, rtol=1e-6)


def test_qr_boxes():
    g = np.zeros((5, 5), bool)
    g[::2, ::2] = True
    v, f = grid2d_to_boxes(g, box_height=2.0)
    assert len(f) > 0 and v[:, 1].max() == 2.0
