"""Fused AO megakernel (models/ao_fused.py) vs the shipped render_ao,
interpret mode on the CPU mesh. Same hemisphere draws, same watertight
accepts (Dekker exact edges), same normal/ONB/offset arithmetic — the
AO image must match except where a closest-hit tie at exactly-equal t
changes the hit prim (tie contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanort_tpu import BVHBuildOptions, build_triangle_bvh
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import (
    make_cornell_box,
    make_uv_sphere,
    merge_meshes,
)
from nanort_tpu.models.ao_fused import build_ao_aux, render_ao_fused
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.models.objrender import render_ao
from nanort_tpu.ops.triangle import TriangleMesh


@pytest.fixture(scope="module")
def scene():
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(8, 16, 0.6))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=8,
                              max_leaf_primitives=8))
    s8 = collapse_bvh8(bvh, np.asarray(v), np.asarray(f), width=16)
    aux = build_ao_aux(mesh, s8)
    s8 = s8._replace(nodes=jnp.asarray(s8.nodes),
                     leafs=jnp.asarray(s8.leafs))
    return mesh, bvh, s8, aux


def test_ao_fused_matches_render_ao(scene):
    mesh, bvh, s8, aux = scene
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=24, height=24, fov=45.0)
    rays = pinhole_rays(cam)
    key = jax.random.PRNGKey(7)
    aovs_ref, hits_ref = render_ao(bvh, mesh, rays, key, n_samples=8,
                                   max_leaf=8)
    aovs_f, hits_f = render_ao_fused(mesh, rays, key, s8, aux,
                                     n_samples=8)
    np.testing.assert_array_equal(np.asarray(aovs_f["hit"]),
                                  np.asarray(aovs_ref["hit"]))
    ao_r = np.asarray(aovs_ref["ao"])
    ao_f = np.asarray(aovs_f["ao"])
    same = ao_f == ao_r
    # cross-engine contract on the CPU mesh: XLA contracts the two
    # programs differently (1-ulp t noise -> occasional occlusion
    # flips), so this is the stack-vs-packet "4 ulp + same prim" bar;
    # the TRUE bit-parity check runs on TPU, where both paths execute
    # the same Mosaic leaf ops (tools/exp_r4_aofused.py)
    assert same.mean() > 0.97, same.mean()
    hitm = np.asarray(aovs_ref["hit"])
    samep = (np.asarray(hits_f.prim_id)
             == np.asarray(hits_ref.prim_id)) & hitm
    # a different prim is legal ONLY at a bit-equal t (coplanar tie)
    tr_all = np.asarray(hits_ref.t)
    tf_all = np.asarray(hits_f.t)
    ties = hitm & ~samep
    np.testing.assert_array_equal(tf_all[ties], tr_all[ties])
    tr = tr_all[samep]
    tf = tf_all[samep]
    assert (np.abs(tf - tr) <= 4 * np.spacing(tr)).all()


def test_ao_fused_radius_and_shapes(scene):
    mesh, bvh, s8, aux = scene
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=16, height=16, fov=45.0)
    rays = pinhole_rays(cam)
    key = jax.random.PRNGKey(3)
    aovs_near, _ = render_ao_fused(mesh, rays, key, s8, aux,
                                   n_samples=4, ao_radius=0.05)
    aovs_far, _ = render_ao_fused(mesh, rays, key, s8, aux,
                                  n_samples=4, ao_radius=1e30)
    ao_n = np.asarray(aovs_near["ao"])
    ao_f = np.asarray(aovs_far["ao"])
    assert ao_n.shape == (16, 16)
    # shrinking the radius can only open up occlusion
    assert (ao_n >= ao_f - 1e-6).all()
    assert ao_n.mean() > ao_f.mean()
