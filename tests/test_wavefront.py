"""Wavefront skip-link traversal parity vs stack traversal and oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from nanort_tpu import (
    BVHBuildOptions,
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
