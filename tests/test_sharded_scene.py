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


def test_packet_chunk_tables_and_sequential_traverse(monkeypatch):
    """build_scene_chunks(packet=True) bakes GLOBAL prim ids into the
    per-chunk BVH8 leaf lanes, and sequential_chunk_traverse (the
    single-chip proof of the ring's packet layout, VERDICT r2 #6)
    reproduces the single-BVH result. The Pallas kernel is stubbed with
    the numpy BVH8 walker on CPU."""
    import jax.numpy as jnp
    from test_treelet import _fake_traverse_bvh8

    from nanort_tpu import (
        BVHBuildOptions,
        TriangleMesh,
        brute_force_traverse,
        build_triangle_bvh,
        make_rays,
    )
    from nanort_tpu.io.procedural import make_uv_sphere
    from nanort_tpu.parallel.sharded_scene import (
        build_scene_chunks,
        sequential_chunk_traverse,
    )
    from nanort_tpu.traverse import pallas_packet as _pp

    monkeypatch.setattr(_pp, "traverse_bvh8", _fake_traverse_bvh8)

    v, f = make_uv_sphere(16, 32, 1.0)
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    opts = BVHBuildOptions(min_leaf_primitives=8, max_leaf_primitives=8)
    sc = build_scene_chunks(mesh, 4, opts, packet=True)
    assert sc.nodes8 is not None and sc.nodes8.shape[0] == 4
    assert sc.leafs8 is not None

    # every global prim id appears exactly once across all chunk leafs
    pids = []
    for c in range(4):
        nodes = sc.nodes8[c]
        stack = [0]
        while stack:
            nid = stack.pop()
            row = nodes[nid]
            for cc in range(8):
                if row[8 * cc] >= 3.0e38:
                    continue
                meta = int(row[64 + cc])
                if meta >= 0:
                    stack.append(meta)
                else:
                    lrow = sc.leafs8[c, -meta - 1]
                    for t in range(int(row[72 + cc])):
                        pids.append(int(lrow[90 + t]))
    assert sorted(pids) == list(range(len(f)))

    rng = np.random.default_rng(5)
    org = rng.uniform(-3, 3, (64, 3)).astype(np.float32)
    tgt = rng.uniform(-0.7, 0.7, (64, 3))
    d = tgt - org
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    rays = make_rays(org, d)
    got = sequential_chunk_traverse(sc, rays)
    want = brute_force_traverse(mesh, rays)
    gp = np.asarray(got.prim_id)
    wp = np.asarray(want.prim_id)
    gh = gp != 0xFFFFFFFF
    wh = wp != 0xFFFFFFFF
    assert (gh == wh).all() and gh.any()
    same = gp[gh] == wp[gh]
    # equal-t ties may legally differ; t must match everywhere
    np.testing.assert_allclose(
        np.asarray(got.t)[gh], np.asarray(want.t)[gh], rtol=1e-4
    )
    assert same.mean() > 0.97
