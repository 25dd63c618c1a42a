""">HBM sharded-scene traversal on the virtual 8-device CPU mesh.

Scene chunks sharded one-per-device; rays ride a ppermute ring visiting
every chunk (SURVEY.md §2.7 "Distributed backend" plan). Results must
match a single-BVH traversal of the unsplit scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanort_tpu import build_triangle_bvh, make_rays, traverse_triangles
from nanort_tpu.io.procedural import (
    make_cornell_box,
    make_random_triangles,
    make_uv_sphere,
    merge_meshes,
)
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.parallel.mesh import ray_mesh
from nanort_tpu.parallel.sharded_scene import (
    build_scene_chunks,
    sharded_scene_traverse,
)

from test_traverse import _random_rays, assert_hits_match

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _scene(kind):
    if kind == "mixed":
        v, f = merge_meshes(
            make_cornell_box(2.0), make_uv_sphere(12, 24, 0.6)
        )
    else:
        v, f = make_random_triangles(1500, seed=3)
    return TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))


@pytest.mark.parametrize("kind", ["mixed", "soup"])
def test_sharded_scene_matches_flat(kind):
    mesh = _scene(kind)
    sharded = build_scene_chunks(mesh, 8)
    dmesh = ray_mesh(8)
    rays = _random_rays(1024, seed=17)
    got = sharded_scene_traverse(sharded, rays, dmesh, tile=128)
    bvh, _ = build_triangle_bvh(mesh)
    want = traverse_triangles(bvh, mesh, rays)
    assert np.asarray(want.hit).any()
    assert_hits_match(got, want, rays)


def test_sharded_scene_ray_windows():
    mesh = _scene("mixed")
    sharded = build_scene_chunks(mesh, 8)
    dmesh = ray_mesh(8)
    org = np.zeros((64, 3), np.float32)
    dirs = np.tile([0, 0, -1.0], (64, 1)).astype(np.float32)
    rays = make_rays(org, dirs, min_t=0.1, max_t=0.2)  # window excludes all
    got = sharded_scene_traverse(sharded, rays, dmesh, tile=64)
    assert not np.asarray(got.prim_id != 0xFFFFFFFF).any()


def test_chunking_validation():
    mesh = _scene("soup")
    with pytest.raises(ValueError):
        build_scene_chunks(mesh, 100000)  # more chunks than faces
    sharded = build_scene_chunks(mesh, 4)
    with pytest.raises(ValueError):
        sharded_scene_traverse(sharded, _random_rays(64, 1), ray_mesh(8))
