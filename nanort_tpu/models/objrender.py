"""objrender: the reference's minimal renderer, plus ambient occlusion.

Reproduces examples/objrender/main.cc:581-709 as a jitted wavefront:
camera rays -> BVH traverse -> normal-shaded RGB + the GUI's AOV set
(normal/position/depth/texcoord/prim_id, gui/render-config.h:34-41 — the
de-facto observability surface per SURVEY.md §5). The per-scanline OpenMP
loop (objrender/main.cc:647-649) becomes a single whole-frame megabatch.

Also provides the ambient-occlusion pass (BASELINE.json config 1):
cosine-hemisphere occlusion rays with per-ray skip of the hit primitive.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math import normalize
from ..core.options import BVHTraceOptions
from ..core.ray import Rays, make_rays
from ..ops.triangle import TriangleMesh
from ..traverse.stack import traverse_triangles


class MeshAttributes(NamedTuple):
    """Optional facevarying shading attributes, the reference example
    Mesh layout (objrender/main.cc Mesh: facevarying normals/uvs)."""

    normals: jnp.ndarray | None = None  # (F, 3, 3) facevarying
    uvs: jnp.ndarray | None = None  # (F, 3, 2) facevarying


def face_normals(mesh: TriangleMesh, fids: jnp.ndarray) -> jnp.ndarray:
    """Geometric normals for a batch of face ids."""
    f = jnp.take(mesh.faces, fids.astype(jnp.int32), axis=0)
    tri = jnp.take(mesh.vertices, f, axis=0)
    n = jnp.cross(tri[..., 1, :] - tri[..., 0, :], tri[..., 2, :] - tri[..., 0, :])
    return normalize(n)


def shading_normals(
    mesh: TriangleMesh, attrs: MeshAttributes | None, hits
) -> jnp.ndarray:
    """Interpolated vertex normals when available, else geometric
    (objrender/main.cc:662-676 equivalent)."""
    fids = hits.prim_id
    if attrs is None or attrs.normals is None:
        return face_normals(mesh, fids)
    n = jnp.take(attrs.normals, fids.astype(jnp.int32), axis=0)  # (..., 3, 3)
    w = (1.0 - hits.u - hits.v)[..., None]
    return normalize(
        w * n[..., 0, :] + hits.u[..., None] * n[..., 1, :] + hits.v[..., None] * n[..., 2, :]
    )


@functools.partial(jax.jit, static_argnames=("options", "max_leaf"))
def render_aovs(
    bvh,
    mesh: TriangleMesh,
    rays: Rays,
    attrs: MeshAttributes | None = None,
    options: BVHTraceOptions = BVHTraceOptions(),
    max_leaf: int = 4,
    scene8=None,
):
    """One primary-visibility pass returning the AOV dict. Pass ``scene8``
    (a device-resident build.bvh8.BVH8Scene) to run traversals through
    the Pallas packet kernel with ray sorting — the TPU fast path."""
    if scene8 is not None:
        from ..traverse.ray_sort import traverse_bvh8_sorted

        hits = traverse_bvh8_sorted(scene8, rays, options)
    else:
        hits = traverse_triangles(bvh, mesh, rays, options, max_leaf=max_leaf)
    hit = hits.hit
    n = shading_normals(mesh, attrs, hits)
    # flip toward the ray like the normal-shading example output
    rgb = jnp.where(hit[..., None], 0.5 * n + 0.5, jnp.zeros_like(n))
    pos = rays.org + hits.t[..., None] * rays.dir
    aovs = {
        "rgb": rgb,
        "normal": jnp.where(hit[..., None], n, 0.0),
        "position": jnp.where(hit[..., None], pos, 0.0),
        "depth": jnp.where(hit, hits.t, 0.0),
        "texcoord": jnp.stack([hits.u, hits.v], axis=-1),
        "prim_id": hits.prim_id,
        "hit": hit,
    }
    return aovs, hits


def _cosine_hemisphere(key, shape, dtype):
    """Cosine-weighted hemisphere directions around +z (the reference's
    revised-ONB sampler, path_tracer/main.cc:214-250)."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, shape, dtype)
    u2 = jax.random.uniform(k2, shape, dtype)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    return jnp.stack([x, y, z], axis=-1)


def build_onb(n: jnp.ndarray):
    """Branchless Frisvad-style orthonormal basis around n (..., 3)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt


@functools.partial(
    jax.jit, static_argnames=("n_samples", "options", "max_leaf")
)
def render_ao(
    bvh,
    mesh: TriangleMesh,
    rays: Rays,
    key,
    n_samples: int = 8,
    ao_radius: float = 1e30,
    options: BVHTraceOptions = BVHTraceOptions(),
    max_leaf: int = 4,
    scene8=None,
):
    """Ambient occlusion: fraction of unoccluded cosine-hemisphere
    samples from each primary hit point. Secondary rays skip the hit
    primitive instead of epsilon-offsetting alone (skip_prim_id,
    nanort.h:611-614). ``scene8`` routes all traversals through the
    sorted packet kernel."""
    aovs, hits = render_aovs(bvh, mesh, rays, None, options, max_leaf, scene8)
    hit = hits.hit
    n = aovs["normal"]
    # face the normal toward the incoming ray
    n = jnp.where(
        jnp.sum(n * rays.dir, axis=-1, keepdims=True) > 0, -n, n
    )
    p = aovs["position"]
    t, bt = build_onb(n)
    dt = rays.dtype
    eps = jnp.asarray(1e-4, dt)

    def one_sample(i, acc):
        k = jax.random.fold_in(key, i)
        d_local = _cosine_hemisphere(k, hit.shape, dt)
        d = (
            d_local[..., 0:1] * t
            + d_local[..., 1:2] * bt
            + d_local[..., 2:3] * n
        )
        sec = make_rays(p + eps * n, d, min_t=0.0, max_t=ao_radius)
        if scene8 is not None:
            from ..traverse.ray_sort import traverse_bvh8_sorted

            occ = traverse_bvh8_sorted(
                scene8, sec, options, skip_prim_id=hits.prim_id,
                occlusion=True,
            )
        else:
            occ = traverse_triangles(
                bvh, mesh, sec, options, skip_prim_id=hits.prim_id,
                max_leaf=max_leaf,
            )
        return acc + jnp.where(hit & ~occ.hit, 1.0, 0.0)

    open_frac = jax.lax.fori_loop(
        0, n_samples, one_sample, jnp.zeros(hit.shape, dt)
    ) / n_samples
    ao = jnp.where(hit, open_frac, 0.0)
    return {**aovs, "ao": ao, "rgb": ao[..., None].repeat(3, -1)}, hits
