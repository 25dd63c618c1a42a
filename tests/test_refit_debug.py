"""BVH refit + debug utilities."""

import numpy as np
import pytest

from nanort_tpu import (
    brute_force_traverse,
    build_triangle_bvh,
    make_rays,
    traverse_triangles,
    validate,
)
from nanort_tpu.build.refit import refit_bvh
from nanort_tpu.io.procedural import make_uv_sphere
from nanort_tpu.ops.triangle import TriangleMesh, triangle_prim_bounds
from nanort_tpu.utils.debug import assert_finite_image, trap_nans, validate_rays

from test_traverse import _random_rays, assert_hits_match


def test_refit_deformed_sphere():
    v, f = make_uv_sphere(12, 24)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(mesh)
    # squash the sphere: same topology, new bounds
    v2 = v * np.asarray([1.0, 0.4, 1.3], np.float32)
    mesh2 = TriangleMesh(vertices=v2, faces=f)
    bmin2, bmax2, _ = triangle_prim_bounds(mesh2)
    bvh2 = refit_bvh(bvh, bmin2, bmax2)
    validate(bvh2, bmin2, bmax2, num_prims=len(f))
    rays = _random_rays(400, seed=9)
    want = brute_force_traverse(mesh2, rays)
    got = traverse_triangles(bvh2, mesh2, rays)
    assert_hits_match(got, want, rays)


def test_refit_translation():
    v, f = make_uv_sphere(8, 16)
    mesh = TriangleMesh(vertices=v, faces=f)
    bvh, _ = build_triangle_bvh(mesh)
    v2 = v + np.asarray([5, 0, 0], np.float32)
    bmin2, bmax2, _ = triangle_prim_bounds(TriangleMesh(vertices=v2, faces=f))
    bvh2 = refit_bvh(bvh, bmin2, bmax2)
    np.testing.assert_allclose(np.asarray(bvh2.bmin[0]), [4, -1, -1], atol=1e-5)
    # original stays untouched
    np.testing.assert_allclose(np.asarray(bvh.bmin[0]), [-1, -1, -1], atol=1e-5)


def test_validate_rays():
    good = make_rays(np.zeros((4, 3), np.float32), np.ones((4, 3), np.float32))
    validate_rays(good)
    bad = make_rays(
        np.asarray([[np.nan, 0, 0]], np.float32), np.ones((1, 3), np.float32)
    )
    with pytest.raises(ValueError, match="non-finite"):
        validate_rays(bad)
    zero = make_rays(np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32))
    with pytest.raises(ValueError, match="zero-direction"):
        validate_rays(zero, allow_zero_dir=False)


def test_trap_nans_and_finite_image():
    import jax.numpy as jnp

    assert_finite_image(np.ones((2, 2, 3)))
    with pytest.raises(AssertionError):
        assert_finite_image(np.asarray([np.inf]))
    with trap_nans():
        with pytest.raises(FloatingPointError):
            _ = jnp.log(jnp.zeros(4)) * 0.0 + jnp.nan  # nan creation trips
