"""Bezier curve primitive (Nakamaru-Ohno style segment tests)."""

import jax.numpy as jnp
import numpy as np

from nanort_tpu import make_rays
from nanort_tpu.ops.curve import Curves, build_curve_bvh, traverse_curves


def _straight_curve():
    # a straight "curve" along x from -1 to 1 at y=z=0, radius 0.2
    pts = np.array(
        [[[-1, 0, 0], [-0.33, 0, 0], [0.33, 0, 0], [1, 0, 0]]], np.float32
    )
    return Curves(points=jnp.asarray(pts), radii=jnp.full((1, 4), 0.2, jnp.float32))


def test_straight_curve_hit():
    c = _straight_curve()
    bvh, _ = build_curve_bvh(c)
    rays = make_rays(
        np.array([[0, 0, 5], [0, 0.5, 5], [2, 0, 5]], np.float32),
        np.tile([0, 0, -1.0], (3, 1)).astype(np.float32),
    )
    h = traverse_curves(bvh, c, rays)
    hits = np.asarray(h.hit)
    assert hits[0] and not hits[1] and not hits[2]
    # ribbon test: distance to axis when the ray passes the center
    # t = distance to the z=0 plane of the curve = 5 (within half-width)
    np.testing.assert_allclose(float(h.t[0]), 5.0, atol=0.15)
    # u is the global curve parameter: ray at x=0 -> middle
    np.testing.assert_allclose(float(h.u[0]), 0.5, atol=0.13)


def test_curve_u_parameter_spread():
    c = _straight_curve()
    bvh, _ = build_curve_bvh(c)
    xs = np.linspace(-0.9, 0.9, 7, dtype=np.float32)
    org = np.stack([xs, np.zeros_like(xs), np.full_like(xs, 5)], -1)
    d = np.tile([0, 0, -1.0], (7, 1)).astype(np.float32)
    h = traverse_curves(bvh, c, make_rays(org, d))
    assert np.asarray(h.hit).all()
    u = np.asarray(h.u)
    assert (np.diff(u) > 0).all()  # u increases along the curve
    np.testing.assert_allclose(u, (xs + 1) / 2, atol=0.15)


def test_bent_curve():
    # quarter-circle-ish bend in the xy plane
    pts = np.array(
        [[[-1, 0, 0], [-0.5, 0.8, 0], [0.5, 0.8, 0], [1, 0, 0]]], np.float32
    )
    c = Curves(points=jnp.asarray(pts), radii=jnp.full((1, 4), 0.1, jnp.float32))
    bvh, _ = build_curve_bvh(c)
    rays = make_rays(
        np.array([[0, 0.6, 5], [0, 0.0, 5]], np.float32),
        np.tile([0, 0, -1.0], (2, 1)).astype(np.float32),
    )
    h = traverse_curves(bvh, c, rays, num_subdivisions=8)
    hits = np.asarray(h.hit)
    assert hits[0] and not hits[1]  # apex at y=0.6, nothing at y=0
