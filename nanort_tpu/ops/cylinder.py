"""Cylinder primitive kind (capped, per-endpoint radius).

Re-derivation of examples/cylinder_primitive/main.cc:94-345 (CylinderPred
/ CylinderGeometry / CylinderIntersector + solve2e): each primitive is a
segment (p0, p1) with radii (r0, r1); the intersector tests the two cap
planes first, then the infinite-cylinder quadratic (Ericson-style
A = dd*nn - nd^2 form) clipped to 0 <= s <= 1, using rr = max(r0, r1)
like the reference. u/v: caps report (sqrt(dist^2), 0 or 1), the body
reports (0, s).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.ray import Hits, Rays


class Cylinders(NamedTuple):
    """SoA segments: p0/p1 (N, 3), r0/r1 (N,)."""

    p0: jnp.ndarray
    p1: jnp.ndarray
    r0: jnp.ndarray
    r1: jnp.ndarray

    @property
    def num_prims(self) -> int:
        return self.p0.shape[0]


class CylRayCtx(NamedTuple):
    org: jnp.ndarray
    dir: jnp.ndarray
    min_t: jnp.ndarray


def cylinder_prim_bounds(c: Cylinders):
    """Segment box inflated by the endpoint radii (CylinderGeometry::
    BoundingBox, cylinder_primitive/main.cc:135-175)."""
    p0 = np.asarray(c.p0)
    p1 = np.asarray(c.p1)
    r0 = np.asarray(c.r0)[:, None]
    r1 = np.asarray(c.r1)[:, None]
    bmin = np.minimum(p0 - r0, p1 - r1)
    bmax = np.maximum(p0 + r0, p1 + r1)
    return bmin, bmax, 0.5 * (p0 + p1)


def cylinder_prepare(c: Cylinders, rays) -> CylRayCtx:
    del c
    return CylRayCtx(org=rays.org, dir=rays.dir, min_t=rays.min_t)


def _solve2e(A, B, C):
    """Smallest real root of A t^2 + 2 B t + C = 0 in the reference's
    formulation (solve2e, cylinder_primitive/main.cc:61-92). Returns
    (has_root, t_small)."""
    lin = jnp.abs(A) <= 1.0e-6
    safe_B = jnp.where(B != 0, B, 1.0)
    x_lin = -C / safe_B
    D = B * B - A * C
    safe_A = jnp.where(lin, 1.0, A)
    sqrtD = jnp.sqrt(jnp.maximum(D, 0.0))
    x1 = (jnp.abs(B) + sqrtD) / safe_A
    x1 = jnp.where(B >= 0.0, -x1, x1)
    safe_x1 = jnp.where(x1 != 0, x1, 1.0)
    x2 = C / (safe_A * safe_x1)
    lo = jnp.minimum(x1, x2)
    double = D == 0.0
    x_dbl = -B / safe_A
    root = jnp.where(lin, x_lin, jnp.where(double, x_dbl, lo))
    has = jnp.where(lin, B != 0, D >= 0.0)
    return has, root


def cylinder_intersect(c: Cylinders, ctx: CylRayCtx, prim_ids, t_cur,
                       test_cap: bool = True):
    """(valid, t, u, v) for (..., L) prim ids."""
    ids = prim_ids.astype(jnp.int32)
    p0 = jnp.take(c.p0, ids, axis=0)
    p1 = jnp.take(c.p1, ids, axis=0)
    r0 = jnp.take(c.r0, ids, axis=0)
    r1 = jnp.take(c.r1, ids, axis=0)
    rr = jnp.maximum(r0, r1)

    org = ctx.org[..., None, :]
    n = ctx.dir[..., None, :]
    tmax = t_cur[..., None]
    d = p1 - p0
    m = org - p0
    md = jnp.sum(m * d, -1)
    nd = jnp.sum(n * d, -1)
    dd = jnp.sum(d * d, -1)

    kEPS = 1.0e-6
    big = jnp.array(jnp.finfo(org.dtype).max, org.dtype)

    # --- caps (cylinder_primitive/main.cc:269-309) ---
    cap_t = jnp.full(md.shape, big)
    cap_u = jnp.zeros_like(cap_t)
    cap_v = jnp.zeros_like(cap_t)
    hit_cap = jnp.zeros(md.shape, bool)
    if test_cap:
        dlen = jnp.sqrt(jnp.maximum(dd, 1e-30))
        dn0 = (p0 - p1) / dlen[..., None]
        rd = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
        denom0 = jnp.sum(rd * dn0, -1)
        plane_ok = jnp.abs(jnp.sum(n * dn0, -1)) > kEPS
        p0D = -jnp.sum(p0 * dn0, -1)
        p1D = -jnp.sum(p1 * -dn0, -1)
        safe0 = jnp.where(denom0 != 0, denom0, 1.0)
        p0T = -(jnp.sum(org * dn0, -1) + p0D) / safe0
        p1T = -(jnp.sum(org * -dn0, -1) + p1D) / jnp.where(-denom0 != 0, -denom0, 1.0)
        q0 = org + p0T[..., None] * rd
        q1 = org + p1T[..., None] * rd
        qp0 = jnp.sum((q0 - p0) ** 2, -1)
        qp1 = jnp.sum((q1 - p1) ** 2, -1)
        hit0 = plane_ok & (p0T > 0.0) & (p0T < tmax) & (qp0 < rr * rr)
        cap_t = jnp.where(hit0, p0T, cap_t)
        cap_u = jnp.where(hit0, jnp.sqrt(qp0), cap_u)
        cap_v = jnp.where(hit0, 0.0, cap_v)
        hit1 = plane_ok & (p1T > 0.0) & (p1T < tmax) & (p1T < cap_t) & (qp1 < rr * rr)
        cap_t = jnp.where(hit1, p1T, cap_t)
        cap_u = jnp.where(hit1, jnp.sqrt(qp1), cap_u)
        cap_v = jnp.where(hit1, 1.0, cap_v)
        hit_cap = hit0 | hit1

    # --- body (cylinder_primitive/main.cc:311-338) ---
    outside = ((md <= 0.0) & (nd <= 0.0)) | ((md >= dd) & (nd >= 0.0))
    nn = jnp.sum(n * n, -1)
    mn = jnp.sum(m * n, -1)
    A = dd * nn - nd * nd
    k = jnp.sum(m * m, -1) - rr * rr
    C = dd * k - md * md
    B = dd * mn - nd * md
    has_root, t_body = _solve2e(A, B, C)
    s = (md + t_body * nd) / jnp.where(dd != 0, dd, 1.0)
    body_ok = (
        ~outside & has_root & (t_body >= 0) & (t_body <= tmax)
        & (t_body <= cap_t) & (s >= 0) & (s <= 1)
    )

    t = jnp.where(body_ok, t_body, cap_t)
    u = jnp.where(body_ok, 0.0, cap_u)
    v = jnp.where(body_ok, s, cap_v)
    valid = body_ok | (hit_cap & ~outside) | (hit_cap & outside)
    valid = valid & (t <= tmax) & (t >= ctx.min_t[..., None])
    return valid, t, u, v


def build_cylinder_bvh(c: Cylinders, options=None):
    from ..build.sah import build_sah
    from ..core.options import BVHBuildOptions

    bmin, bmax, centers = cylinder_prim_bounds(c)
    return build_sah(bmin, bmax, centers, options or BVHBuildOptions())


def traverse_cylinders(bvh, c: Cylinders, rays: Rays, options=None,
                       max_leaf: int = 4, max_stack: int | None = None) -> Hits:
    from ..core.options import BVHTraceOptions
    from ..traverse.stack import traverse

    options = options or BVHTraceOptions()
    return traverse(
        bvh, c, rays, options,
        prepare_fn=cylinder_prepare,
        intersect_fn=cylinder_intersect,
        max_leaf=max_leaf,
        max_stack=max_stack,
    )
