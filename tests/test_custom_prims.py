"""Custom primitive kinds: spheres and cylinders through the generic
traversal protocol, validated against analytic expectations and an O(n)
scan (the protocol the reference expresses as templates, SURVEY.md §2.4)."""

import jax.numpy as jnp
import numpy as np

from nanort_tpu import make_rays
from nanort_tpu.ops.cylinder import (
    Cylinders,
    build_cylinder_bvh,
    cylinder_intersect,
    cylinder_prepare,
    traverse_cylinders,
)
from nanort_tpu.ops.sphere import (
    Spheres,
    build_sphere_bvh,
    sphere_intersect,
    sphere_prepare,
    traverse_spheres,
)


def _random_spheres(n, seed=0):
    rng = np.random.default_rng(seed)
    return Spheres(
        centers=jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32)),
        radii=jnp.asarray(rng.uniform(0.05, 0.3, n).astype(np.float32)),
    )


class TestSpheres:
    def test_analytic_hit(self):
        s = Spheres(
            centers=jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
            radii=jnp.asarray([1.0], jnp.float32),
        )
        bvh, _ = build_sphere_bvh(s)
        rays = make_rays(
            np.array([[0, 0, 5], [0, 2, 5], [0, 0, 0.5]], np.float32),
            np.tile([0, 0, -1.0], (3, 1)).astype(np.float32),
        )
        h = traverse_spheres(bvh, s, rays)
        hits = np.asarray(h.hit)
        assert hits[0] and not hits[1] and hits[2]
        np.testing.assert_allclose(float(h.t[0]), 4.0, rtol=1e-6)
        # inside the sphere: nearest positive root is the far shell
        np.testing.assert_allclose(float(h.t[2]), 1.5, rtol=1e-6)

    def test_uv_spherical(self):
        s = Spheres(
            centers=jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
            radii=jnp.asarray([1.0], jnp.float32),
        )
        bvh, _ = build_sphere_bvh(s)
        # hit the north pole: v = acos(1)/pi = 0
        rays = make_rays(
            np.array([[0, 5, 0]], np.float32), np.array([[0, -1.0, 0]], np.float32)
        )
        h = traverse_spheres(bvh, s, rays)
        assert bool(h.hit[0])
        np.testing.assert_allclose(float(h.v[0]), 0.0, atol=1e-3)
        # hit +z equator: u = (atan2(0,1)+pi)/2pi = 0.5, v = 0.5
        rays = make_rays(
            np.array([[0, 0, 5]], np.float32), np.array([[0, 0, -1.0]], np.float32)
        )
        h = traverse_spheres(bvh, s, rays)
        np.testing.assert_allclose(float(h.u[0]), 0.5, atol=1e-6)
        np.testing.assert_allclose(float(h.v[0]), 0.5, atol=1e-6)

    def test_bvh_matches_linear_scan(self):
        s = _random_spheres(300, seed=4)
        bvh, _ = build_sphere_bvh(s)
        rng = np.random.default_rng(1)
        org = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
        d = -org + rng.uniform(-1, 1, (256, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = make_rays(org, d.astype(np.float32))
        got = traverse_spheres(bvh, s, rays)
        # O(n) oracle via the same intersect function over all prims
        ctx = sphere_prepare(s, rays)
        ids = jnp.broadcast_to(
            jnp.arange(s.num_prims, dtype=jnp.uint32), (256, s.num_prims)
        )
        valid, t, _, _ = sphere_intersect(
            s, ctx, ids, jnp.full((256,), 1e30, jnp.float32)
        )
        t_m = np.asarray(jnp.where(valid, t, np.inf))
        want_t = t_m.min(axis=1)
        want_hit = np.isfinite(want_t)
        np.testing.assert_array_equal(np.asarray(got.hit), want_hit)
        np.testing.assert_allclose(
            np.asarray(got.t)[want_hit], want_t[want_hit], rtol=2e-5  # jit vs eager FMA fusion drift
        )

    def test_min_t_window(self):
        s = Spheres(
            centers=jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
            radii=jnp.asarray([1.0], jnp.float32),
        )
        bvh, _ = build_sphere_bvh(s)
        rays = make_rays(
            np.array([[0, 0, 5]], np.float32),
            np.array([[0, 0, -1.0]], np.float32),
            min_t=4.5,
        )
        h = traverse_spheres(bvh, s, rays)
        # near shell at t=4 is below min_t; far shell at t=6 wins
        assert bool(h.hit[0])
        np.testing.assert_allclose(float(h.t[0]), 6.0, rtol=1e-6)


class TestCylinders:
    def _one(self):
        return Cylinders(
            p0=jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32),
            p1=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
            r0=jnp.asarray([0.5], jnp.float32),
            r1=jnp.asarray([0.5], jnp.float32),
        )

    def test_body_hit(self):
        c = self._one()
        bvh, _ = build_cylinder_bvh(c)
        rays = make_rays(
            np.array([[0, 0, 5], [0, 2, 5], [0.6, 0, 5]], np.float32),
            np.tile([0, 0, -1.0], (3, 1)).astype(np.float32),
        )
        h = traverse_cylinders(bvh, c, rays)
        hits = np.asarray(h.hit)
        assert hits[0] and not hits[1] and not hits[2]
        np.testing.assert_allclose(float(h.t[0]), 4.5, rtol=1e-5)
        # v = parametric position along the axis: middle -> 0.5
        np.testing.assert_allclose(float(h.v[0]), 0.5, atol=1e-5)

    def test_cap_hit(self):
        c = self._one()
        bvh, _ = build_cylinder_bvh(c)
        # ray straight down onto the top cap (y=+1 plane)
        rays = make_rays(
            np.array([[0.2, 5, 0]], np.float32), np.array([[0, -1.0, 0]], np.float32)
        )
        h = traverse_cylinders(bvh, c, rays)
        assert bool(h.hit[0])
        np.testing.assert_allclose(float(h.t[0]), 4.0, rtol=1e-5)
        # cap u = distance from cap center, v = 1 for the p1 cap
        np.testing.assert_allclose(float(h.u[0]), 0.2, atol=1e-5)
        np.testing.assert_allclose(float(h.v[0]), 1.0, atol=1e-6)

    def test_many_cylinders(self):
        rng = np.random.default_rng(3)
        n = 100
        p0 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        p1 = p0 + rng.normal(0, 0.5, (n, 3)).astype(np.float32)
        r = rng.uniform(0.02, 0.1, n).astype(np.float32)
        c = Cylinders(p0=jnp.asarray(p0), p1=jnp.asarray(p1),
                      r0=jnp.asarray(r), r1=jnp.asarray(r))
        bvh, _ = build_cylinder_bvh(c)
        org = rng.uniform(-4, 4, (128, 3)).astype(np.float32)
        d = -org + rng.uniform(-1, 1, (128, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = make_rays(org, d.astype(np.float32))
        got = traverse_cylinders(bvh, c, rays)
        # oracle: scan all prims with the same intersect fn
        ctx = cylinder_prepare(c, rays)
        ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32), (128, n))
        valid, t, _, _ = cylinder_intersect(
            c, ctx, ids, jnp.full((128,), 1e30, jnp.float32)
        )
        t_m = np.asarray(jnp.where(valid, t, np.inf))
        want_t = t_m.min(axis=1)
        want_hit = np.isfinite(want_t)
        np.testing.assert_array_equal(np.asarray(got.hit), want_hit)
        np.testing.assert_allclose(
            np.asarray(got.t)[want_hit], want_t[want_hit], rtol=1e-4
        )
