"""Cubic Bezier curve primitive kind (hair/fur ribbons).

Re-derivation of examples/curves_primitive/main.cc:382-800 (CurvePred /
CurveGeometry / CurveIntersector), the Nakamaru-Ohno / Woop-style method:

* ``GetZAlign`` (main.cc:382-417): build the rotation+translation taking
  the ray to the +z axis through the origin (with the reference's
  degenerate-dxz branch for near-vertical rays),
* project the 4 control points into ray space, reject when the curve is
  too close (t_z < 4 * max_radius / 2, main.cc:676-680),
* evaluate the Bezier by de Casteljau at S+1 parameters, treat each of
  the S spans as a 2D line segment with lerped half-radius width, find
  the closest point to the z axis, accept when dist^2 <= radius^2 and
  t = P.z improves (main.cc:686-760),
* u = global curve parameter of the closest point, v = sqrt(d2).

All segments evaluate vectorized over (ray, prim, segment); the reference
default num_subdivisions = 4 is a static parameter.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.ray import Hits, Rays


class Curves(NamedTuple):
    """SoA cubic Bezier set: control points (N, 4, 3), radii (N, 4)."""

    points: jnp.ndarray
    radii: jnp.ndarray

    @property
    def num_prims(self) -> int:
        return self.points.shape[0]


class CurveRayCtx(NamedTuple):
    rot: jnp.ndarray  # (..., 3, 3) z-align rotation
    trans: jnp.ndarray  # (..., 3)
    min_t: jnp.ndarray


def curve_prim_bounds(c: Curves):
    """Control-hull box inflated per-point radius (CurveGeometry::
    BoundingBox, main.cc:513-556); centroid = control-point mean
    (CurvePred, main.cc:491-504)."""
    p = np.asarray(c.points)
    r = np.asarray(c.radii)[..., None]
    return (p - r).min(1), (p + r).max(1), p.mean(1)


def _z_align(org, d):
    """GetZAlign vectorized (main.cc:382-417). org/d: (..., 3)."""
    lx, ly, lz = d[..., 0], d[..., 1], d[..., 2]
    dxz = jnp.sqrt(lx * lx + lz * lz)
    ok = dxz > 0
    sd = jnp.where(ok, dxz, 1.0)
    m_ok = jnp.stack(
        [
            jnp.stack([lz / sd, -lx / sd * ly, lx], -1),
            jnp.stack([jnp.zeros_like(lx), dxz, ly], -1),
            jnp.stack([-lx / sd, -ly / sd * lz, lz], -1),
        ],
        -2,
    )
    sgn = jnp.where(ly > 0, 1.0, -1.0)
    zeros = jnp.zeros_like(lx)
    ones = jnp.ones_like(lx)
    m_deg = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], -1),
            jnp.stack([zeros, zeros, -sgn], -1),
            jnp.stack([zeros, sgn, zeros], -1),
        ],
        -2,
    )
    rot = jnp.where(ok[..., None, None], m_ok, m_deg)
    trans = -jnp.einsum("...i,...ij->...j", org, rot)
    return rot, trans


def curve_prepare(c: Curves, rays) -> CurveRayCtx:
    del c
    rot, trans = _z_align(rays.org, rays.dir)
    return CurveRayCtx(rot=rot, trans=trans, min_t=rays.min_t)


def _bezier(cp, t):
    """de Casteljau at parameter t. cp: (..., 4, 3); t scalar."""
    u = 1.0 - t
    a = u * cp[..., 0, :] + t * cp[..., 1, :]
    b = u * cp[..., 1, :] + t * cp[..., 2, :]
    cc = u * cp[..., 2, :] + t * cp[..., 3, :]
    d = u * a + t * b
    e = u * b + t * cc
    return u * d + t * e


def make_curve_intersect(num_subdivisions: int = 4):
    """Leaf intersect fn for the traversal protocol (cached per S)."""

    @functools.lru_cache(maxsize=None)
    def _cached(n):
        def intersect(c: Curves, ctx: CurveRayCtx, prim_ids, t_cur):
            ids = prim_ids.astype(jnp.int32)
            ocps = jnp.take(c.points, ids, axis=0)  # (..., L, 4, 3)
            radii = jnp.take(c.radii, ids, axis=0)  # (..., L, 4)
            rot = ctx.rot[..., None, :, :]
            trans = ctx.trans[..., None, :]
            cps = jnp.einsum("...ki,...ij->...kj", ocps, rot) + trans[..., None, :]

            t_z = jnp.max(cps[..., 2], axis=-1)
            r0 = radii[..., 0]
            r1 = radii[..., 3]
            uw = jnp.maximum(r0, r1) / 2.0
            near_reject = t_z < 4.0 * uw  # main.cc:676-680

            big = jnp.array(jnp.finfo(cps.dtype).max, cps.dtype)
            best_t = jnp.broadcast_to(t_cur[..., None], t_z.shape)
            best_u = jnp.zeros_like(t_z)
            best_v = jnp.zeros_like(t_z)
            got = jnp.zeros(t_z.shape, bool)
            inv_n = 1.0 / n
            for s in range(n):
                p0 = _bezier(cps, s * inv_n)
                p1 = _bezier(cps, (s + 1) * inv_n)
                w0 = 0.5 * r0
                w1 = 0.5 * r1
                bx = p1[..., 0] - p0[..., 0]
                by = p1[..., 1] - p0[..., 1]
                bz = p1[..., 2] - p0[..., 2]
                bw = w1 - w0
                d0 = -p0[..., 0] * bx + -p0[..., 1] * by
                d1 = bx * bx + by * by
                u = jnp.clip(d0 / jnp.where(d1 != 0, d1, 1.0), 0.0, 1.0)
                px = p0[..., 0] + u * bx
                py = p0[..., 1] + u * by
                t = p0[..., 2] + u * bz
                r = w0 + u * bw
                d2 = px * px + py * py
                ok = (d2 <= r * r) & (t < best_t) & ~near_reject
                best_t = jnp.where(ok, t, best_t)
                best_u = jnp.where(ok, (u + s) * inv_n, best_u)
                best_v = jnp.where(ok, jnp.sqrt(d2), best_v)
                got = got | ok
            valid = got & (best_t >= ctx.min_t[..., None])
            return valid, best_t, best_u, best_v

        return intersect

    return _cached(num_subdivisions)


def build_curve_bvh(c: Curves, options=None):
    from ..build.sah import build_sah
    from ..core.options import BVHBuildOptions

    bmin, bmax, centers = curve_prim_bounds(c)
    return build_sah(bmin, bmax, centers, options or BVHBuildOptions())


def traverse_curves(bvh, c: Curves, rays: Rays, options=None,
                    num_subdivisions: int = 4, max_leaf: int = 4,
                    max_stack: int | None = None) -> Hits:
    from ..core.options import BVHTraceOptions
    from ..traverse.stack import traverse

    options = options or BVHTraceOptions()
    return traverse(
        bvh, c, rays, options,
        prepare_fn=curve_prepare,
        intersect_fn=make_curve_intersect(num_subdivisions),
        max_leaf=max_leaf,
        max_stack=max_stack,
    )
