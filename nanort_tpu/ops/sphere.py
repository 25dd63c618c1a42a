"""Sphere / particle primitive kind.

Re-derivation of examples/particle_primitive/main.cc:82-291 (SpherePred /
SphereGeometry / SphereIntersection / SphereIntersector) — also the
primitive used by the LAS LiDAR viewer (examples/las/render.cc:84-270).

Numerics follow the reference exactly: the numerically-stable q-form of
the quadratic (q = (-b -/+ sqrt(disc))/2 by sign of b), the |disc| < eps
double-root branch, nearest-nonnegative root selection, strict
``t > t_inout`` rejection (equal-t replaces). UV is assigned only to the
final hit (reference PostTraversal): u = (atan2(n.x, n.z) + pi)/(2 pi),
v = acos(n.y)/pi.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.ray import Hits, Rays


class Spheres(NamedTuple):
    """SoA particle set: centers (N, 3), radii (N,)."""

    centers: jnp.ndarray
    radii: jnp.ndarray

    @property
    def num_prims(self) -> int:
        return self.centers.shape[0]


class SphereRayCtx(NamedTuple):
    org: jnp.ndarray
    dir: jnp.ndarray
    min_t: jnp.ndarray


def sphere_prim_bounds(s: Spheres):
    """Center +/- radius boxes (SphereGeometry::BoundingBox,
    particle_primitive/main.cc:120-140)."""
    c = np.asarray(s.centers)
    r = np.asarray(s.radii)[:, None]
    return c - r, c + r, c


def sphere_prepare(s: Spheres, rays) -> SphereRayCtx:
    del s
    return SphereRayCtx(org=rays.org, dir=rays.dir, min_t=rays.min_t)


def sphere_intersect(s: Spheres, ctx: SphereRayCtx, prim_ids, t_cur):
    """(valid, t, u, v) for (..., L) prim ids; uv zeros (PostTraversal
    fills them for the winning hit only, like the reference)."""
    ids = prim_ids.astype(jnp.int32)
    center = jnp.take(s.centers, ids, axis=0)  # (..., L, 3)
    radius = jnp.take(s.radii, ids, axis=0)
    org = ctx.org[..., None, :]
    d = ctx.dir[..., None, :]
    oc = org - center
    a = jnp.sum(d * d, -1)
    b = 2.0 * jnp.sum(d * oc, -1)
    c = jnp.sum(oc * oc, -1) - radius * radius
    disc = b * b - 4.0 * a * c
    eps = jnp.finfo(disc.dtype).eps

    no_roots = disc < 0.0
    double_root = jnp.abs(disc) < eps
    dist_sqrt = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0, (-b - dist_sqrt) / 2.0, (-b + dist_sqrt) / 2.0)
    safe_a = jnp.where(a != 0, a, 1.0)
    safe_q = jnp.where(q != 0, q, 1.0)
    t0 = jnp.where(double_root, -0.5 * b / safe_a, q / safe_a)
    t1 = jnp.where(double_root, t0, c / safe_q)
    t0, t1 = jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    # nearest root inside [min_t, t_cur]. Deviation: the reference picks
    # the nearest non-negative root and never consults ray.min_t
    # (SphereIntersector::Intersect has no t_min test) — we treat min_t
    # like the triangle path does, falling through to the far root when
    # the near one is below the window.
    lo = ctx.min_t[..., None]
    t = jnp.where(t0 >= lo, t0, t1)
    valid = ~no_roots & (a != 0) & (t >= lo) & (t <= t_cur[..., None])
    z = jnp.zeros_like(t)
    return valid, t, z, z


def sphere_post(s: Spheres, rays: Rays, hits: Hits) -> Hits:
    """Fill spherical UV for final hits (PostTraversal,
    particle_primitive/main.cc:268-283)."""
    ids = jnp.where(hits.hit, hits.prim_id, 0).astype(jnp.int32)
    center = jnp.take(s.centers, ids, axis=0)
    p = rays.org + hits.t[..., None] * rays.dir
    n = p - center
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
    u = (jnp.arctan2(n[..., 0], n[..., 2]) + jnp.pi) * (0.5 / jnp.pi)
    v = jnp.arccos(jnp.clip(n[..., 1], -1.0, 1.0)) / jnp.pi
    return hits._replace(
        u=jnp.where(hits.hit, u.astype(hits.u.dtype), hits.u),
        v=jnp.where(hits.hit, v.astype(hits.v.dtype), hits.v),
    )


def build_sphere_bvh(s: Spheres, options=None):
    from ..build.sah import build_sah
    from ..core.options import BVHBuildOptions

    bmin, bmax, centers = sphere_prim_bounds(s)
    return build_sah(bmin, bmax, centers, options or BVHBuildOptions())


def traverse_spheres(bvh, s: Spheres, rays: Rays, options=None,
                     max_leaf: int = 4, max_stack: int | None = None) -> Hits:
    """BVHAccel<float>::Traverse with the sphere intersector."""
    from ..core.options import BVHTraceOptions
    from ..traverse.stack import traverse

    options = options or BVHTraceOptions()
    hits = traverse(
        bvh, s, rays, options,
        prepare_fn=sphere_prepare,
        intersect_fn=sphere_intersect,
        max_leaf=max_leaf,
        max_stack=max_stack,
    )
    return sphere_post(s, rays, hits)
