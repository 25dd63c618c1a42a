"""In-kernel BVH16 traversal (traverse/fused_trace.py) vs the stack
engine, in Pallas interpret mode on the CPU test mesh — the same code
path that compiles on TPU. Closest-hit records must match the oracle
exactly except at equal-t ties (the repo-wide tie contract:
replace-on-<= makes the last equal-t hit in traversal order win,
nanort.h:2487-2556 semantics)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanort_tpu import BVHBuildOptions, build_triangle_bvh, make_rays
from nanort_tpu.build.bvh8 import collapse_bvh8
from nanort_tpu.io.procedural import (
    make_cornell_pt_scene,
    make_subdivided_sphere_scene,
)
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.ops.triangle import TriangleMesh
from nanort_tpu.traverse.fused_trace import (
    build_aux_rows,
    fused_scratch_shapes,
    make_tracer,
)
from nanort_tpu.traverse.stack import traverse_triangles

SUB, LANES = 8, 128
BLK = SUB * LANES


def _trace_kernel(max_leaf, intersector, occlusion, use_skip,
                  nodes_ref, leafs_ref, aux_ref, rays_ref, skip_ref,
                  *rest):
    if occlusion:
        occ_ref, stack_ref, leafq_ref = rest
    else:
        (t_ref, u_ref, v_ref, p_ref, h_ref, m_ref,
         stack_ref, leafq_ref) = rest
    tracer = make_tracer(nodes_ref, leafs_ref, stack_ref, leafq_ref,
                         max_leaf=max_leaf, aux_ref=aux_ref,
                         intersector=intersector)
    args = [rays_ref[c] for c in range(8)]
    skip = skip_ref[:] if use_skip else None
    if occlusion:
        occ_ref[:] = tracer(*args, occlusion=True, skip=skip)
    else:
        t, u, v, p, h, m, gx, gy, gz = tracer(
            *args, want_aux=True, skip=skip)
        t_ref[:] = t
        u_ref[:] = u
        v_ref[:] = v
        p_ref[:] = p
        h_ref[:] = h
        m_ref[:] = m


def run_tracer(s8, aux, rays, *, intersector="mt", occlusion=False,
               skip=None):
    """Flat rays -> records through the fused tracer (interpret mode)."""
    org = jnp.asarray(rays.org, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(rays.dir, jnp.float32).reshape(-1, 3)
    R = org.shape[0]
    NB = -(-R // BLK)
    pad = NB * BLK - R

    def prep(x, fill):
        x = jnp.pad(jnp.asarray(x, jnp.float32).reshape(-1), (0, pad),
                    constant_values=fill)
        return x.reshape(NB, SUB, LANES)

    comps = [prep(org[:, 0], 0), prep(org[:, 1], 0), prep(org[:, 2], 0),
             prep(d[:, 0], 1), prep(d[:, 1], 0), prep(d[:, 2], 0),
             prep(rays.min_t, 1.0), prep(rays.max_t, 0.0)]
    rays8 = jnp.stack(comps, axis=0)  # (8, NB, SUB, LANES)
    if skip is not None:
        sk = jnp.pad(jnp.asarray(skip, jnp.int32).reshape(-1), (0, pad),
                     constant_values=-1)
    else:
        sk = jnp.full((NB * BLK,), -1, jnp.int32)
    skipb = sk.reshape(NB, SUB, LANES)

    kern = functools.partial(_trace_kernel, s8.max_leaf, intersector,
                             occlusion, skip is not None)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((8, None, SUB, LANES),
                            lambda i: (0, i, 0, 0))
    skip_spec = pl.BlockSpec((None, SUB, LANES), lambda i: (i, 0, 0))
    out_spec = pl.BlockSpec((None, SUB, LANES), lambda i: (i, 0, 0))
    if occlusion:
        out_shapes = [jax.ShapeDtypeStruct((NB, SUB, LANES), jnp.int32)]
    else:
        out_shapes = [
            jax.ShapeDtypeStruct((NB, SUB, LANES), jnp.float32)] * 3 + [
            jax.ShapeDtypeStruct((NB, SUB, LANES), jnp.int32)] * 3
    outs = pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[vmem, vmem, vmem, ray_spec, skip_spec],
        out_specs=tuple([out_spec] * len(out_shapes)),
        out_shape=tuple(out_shapes),
        scratch_shapes=fused_scratch_shapes(s8.depth),
        interpret=True,
    )(jnp.asarray(s8.nodes), jnp.asarray(s8.leafs), jnp.asarray(aux),
      rays8, skipb)
    unshape = lambda x: np.asarray(x).reshape(-1)[:R]
    return [unshape(o) for o in outs]


def _scene(n_tris):
    if n_tris == "cornell":
        v, f, mids, _ = make_cornell_pt_scene(2.0)
        v, f = np.asarray(v), np.asarray(f)
    else:
        v, f = make_subdivided_sphere_scene(n_tris)
        v, f = np.asarray(v), np.asarray(f)
        mids = np.zeros(len(f), np.int32)
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(
        mesh, BVHBuildOptions(min_leaf_primitives=4,
                              max_leaf_primitives=4))
    s8 = collapse_bvh8(bvh, v, f, width=16)
    aux = build_aux_rows(s8.leafs, mids, f, v, s8.max_leaf)
    return mesh, bvh, s8, aux, mids


@pytest.fixture(scope="module")
def sphere600():
    return _scene(600)


@pytest.fixture(scope="module")
def cornell36():
    return _scene("cornell")


def _check_closest(mesh, bvh, s8, aux, mids, rays, intersector):
    t, u, v, p, h, m = run_tracer(s8, aux, rays, intersector=intersector)
    oracle = traverse_triangles(bvh, mesh, rays, max_leaf=4)
    oh = np.asarray(oracle.hit).reshape(-1)
    ot = np.asarray(oracle.t).reshape(-1)
    op = np.asarray(oracle.prim_id).reshape(-1).astype(np.int64)
    hit = h != 0
    assert (hit == oh).all(), "hit mask mismatch"
    if intersector == "watertight":
        # same intersector math as the oracle: t bit-identical
        np.testing.assert_array_equal(t[hit], ot[oh])
        same = p[hit] == op[oh]
        # prim may differ only at exactly-equal t (tie contract)
        assert same.all() or (t[hit][~same] == ot[oh][~same]).all()
    else:
        # MT vs watertight: ulp-level t agreement
        np.testing.assert_allclose(t[hit], ot[oh], rtol=1e-4, atol=1e-6)
        frac = (p[hit] == op[oh]).mean()
        assert frac > 0.999, frac
    # aux material ids must be the hit prim's material
    assert (m[hit] == mids[p[hit] % len(mids)]).all()


def test_closest_mt_sphere(sphere600):
    mesh, bvh, s8, aux, mids = sphere600
    cam = look_at(eye=(0, 0, 2.2), center=(0, 0, 0), width=32,
                  height=32, fov=60.0)
    rays = pinhole_rays(cam)
    _check_closest(mesh, bvh, s8, aux, mids, rays, "mt")


def test_closest_watertight_cornell(cornell36):
    mesh, bvh, s8, aux, mids = cornell36
    cam = look_at(eye=(0, 0, 5.0), center=(0, 0, 0), width=32,
                  height=32, fov=45.0)
    rays = pinhole_rays(cam)
    _check_closest(mesh, bvh, s8, aux, mids, rays, "watertight")


def test_occlusion_and_skip(sphere600):
    mesh, bvh, s8, aux, mids = sphere600
    rng = np.random.default_rng(5)
    R = 1536
    org = rng.uniform(-1.5, 1.5, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(org, d, max_t=2.0)
    (occ,) = run_tracer(s8, aux, rays, occlusion=True)
    oracle = traverse_triangles(bvh, mesh, rays, max_leaf=4)
    oh = np.asarray(oracle.hit).reshape(-1)
    # any-hit vs closest-hit: identical boolean (superset argument)
    np.testing.assert_array_equal(occ != 0, oh)

    # skip the oracle's hit prim: rays whose ONLY intersection was that
    # prim must now report unoccluded
    skip = np.where(oh, np.asarray(oracle.prim_id).reshape(-1), -1)
    (occ2,) = run_tracer(s8, aux, rays, occlusion=True,
                         skip=skip.astype(np.int32))
    assert ((occ2 != 0) <= oh).all()
    # and no ray is occluded by its skipped prim alone: retrace with the
    # stack engine's skip support as the oracle
    oracle2 = traverse_triangles(bvh, mesh, rays, max_leaf=4,
                                 skip_prim_id=jnp.asarray(skip))
    np.testing.assert_array_equal(
        occ2 != 0, np.asarray(oracle2.hit).reshape(-1))


def test_degenerate_rays_miss(sphere600):
    mesh, bvh, s8, aux, mids = sphere600
    # off-axis origin: an exactly-on-axis ray hits the sphere's +x pole
    # vertex, the classic Möller–Trumbore shared-vertex hole (the
    # watertight oracle catches it; "mt" legitimately misses)
    org = np.tile(np.asarray([[0.01, 0.02, -0.03]], np.float32),
                  (256, 1))
    d = np.zeros((256, 3), np.float32)
    d[::2, 0] = 1.0  # half real +x rays (from inside the sphere)
    rays = make_rays(org, d)
    t, u, v, p, h, m = run_tracer(s8, aux, rays)
    assert (h[1::2] == 0).all()  # zero-dir rays sanitize to misses
    assert (h[::2] != 0).all()
