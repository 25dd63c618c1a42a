"""Multi-chip sharded traversal on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from nanort_tpu import build_triangle_bvh, make_rays, traverse_triangles
from nanort_tpu.io.procedural import make_uv_sphere
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.parallel.mesh import ray_mesh, sharded_traverse_triangles


def test_sharded_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    v, f = make_uv_sphere(12, 24)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(mesh)

    rng = np.random.default_rng(0)
    n = 1024
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = -org + rng.uniform(-0.5, 0.5, (n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(org, d.astype(np.float32))

    dmesh = ray_mesh(8)
    hits_sh, n_hit = sharded_traverse_triangles(bvh, mesh, rays, dmesh)
    hits = traverse_triangles(bvh, mesh, rays)

    np.testing.assert_array_equal(np.asarray(hits_sh.prim_id), np.asarray(hits.prim_id))
    np.testing.assert_array_equal(np.asarray(hits_sh.t), np.asarray(hits.t))
    assert int(n_hit) == int(np.asarray(hits.hit).sum())


def test_indivisible_batch_raises():
    v, f = make_uv_sphere(6, 12)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(mesh)
    rays = make_rays(np.zeros((10, 3), np.float32), np.tile([0, 0, 1.0], (10, 1)).astype(np.float32))
    dmesh = ray_mesh(8)
    import pytest

    with pytest.raises(ValueError):
        sharded_traverse_triangles(bvh, mesh, rays, dmesh)


def test_sharded_render_step():
    import jax

    from nanort_tpu.parallel.mesh import ray_mesh, sharded_render_step

    v, f = make_uv_sphere(10, 20)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(mesh)
    rng = np.random.default_rng(2)
    org = rng.uniform(-3, 3, (512, 3)).astype(np.float32)
    d = -org + rng.uniform(-0.3, 0.3, (512, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(org, d.astype(np.float32))
    dmesh = ray_mesh(8)
    ao, n_hit, mean_ao = sharded_render_step(bvh, mesh, rays, dmesh)
    ao = np.asarray(ao)
    assert ao.shape == (512,)
    assert 0 < int(n_hit) <= 512
    assert 0.0 <= float(mean_ao) <= 1.0
    # sphere is closed: every primary hit's hemisphere ray either escapes
    # (ao=1, outside) or re-hits (ao=0); both occur
    assert len(np.unique(ao)) >= 2
