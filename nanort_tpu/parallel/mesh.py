"""Multi-chip ray-parallel rendering via jax.sharding + shard_map.

The reference's only parallelism is intra-node threads over scanlines
(SURVEY.md §2.7). The TPU-native equivalent: the scene (BVH + geometry) is
replicated per chip (scenes <= HBM), the ray megabatch is sharded over a
1-D device mesh, and every chip traverses its shard independently — pure
data parallelism with zero inter-chip traffic during traversal. The only
collectives are the final image gather (an all-gather implied by the
output sharding) and optional psum'd render statistics, which ride ICI.

For scenes that exceed HBM the plan (SURVEY.md §2.7 "Distributed backend")
is to shard two-level-BVH node chunks and exchange rays via all-to-all;
that lands with the scene-graph layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.options import BVHTraceOptions, INVALID_PRIM_ID
from ..core.ray import Rays
from ..ops.triangle import TriangleMesh
from ..traverse import stack as _stack
from ..ops import triangle as tri

RAY_AXIS = "rays"


def ray_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over which ray batches shard."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def shard_rays(rays: Rays, mesh: Mesh) -> Rays:
    """Place a ray batch sharded over its leading axis."""
    sh = NamedSharding(mesh, P(RAY_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), rays)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)


@functools.partial(
    jax.jit,
    static_argnames=("options", "max_leaf", "max_stack", "mesh_ctx"),
)
def _sharded_traverse_impl(
    bvh, prims, rays, options, max_leaf, max_stack, mesh_ctx
):
    mesh = mesh_ctx.mesh
    intersect_fn = tri.make_triangle_intersect(
        cull_back_face=options.cull_back_face,
        exact_edge_fallback=options.exact_edge_fallback,
    )

    def local(bvh_l, prims_l, rays_l):
        hits = _stack.traverse(
            bvh_l,
            prims_l,
            rays_l,
            options,
            prepare_fn=tri.triangle_prepare,
            intersect_fn=intersect_fn,
            max_leaf=max_leaf,
            max_stack=max_stack,
        )
        # psum'd hit count: render statistics ride ICI, demonstrating the
        # collective path without touching the hot loop
        n_hit = jax.lax.psum(
            jnp.sum(hits.prim_id != jnp.uint32(INVALID_PRIM_ID)), RAY_AXIS
        )
        return hits, n_hit

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS)),
        out_specs=(P(RAY_AXIS), P()),
    )
    return shard_fn(bvh, prims, rays)


class _MeshCtx:
    """Hashable wrapper so a Mesh can be a static jit argument."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash((self.mesh.shape_tuple, self.mesh.axis_names))

    def __eq__(self, other):
        return isinstance(other, _MeshCtx) and self.mesh == other.mesh


def sharded_traverse_triangles(
    bvh,
    mesh_geom: TriangleMesh,
    rays: Rays,
    device_mesh: Mesh,
    options: BVHTraceOptions = BVHTraceOptions(),
    max_leaf: int = 4,
    max_stack: int = 64,
):
    """Traverse a ray batch sharded across ``device_mesh``.

    Returns (hits sharded like the rays, total hit count). The leading ray
    axis must be divisible by the mesh size.
    """
    n = device_mesh.devices.size
    lead = rays.org.shape[0]
    if lead % n:
        raise ValueError(f"ray batch {lead} not divisible by mesh size {n}")
    bvh_r = replicate(bvh, device_mesh)
    geom_r = replicate(mesh_geom, device_mesh)
    rays_s = shard_rays(rays, device_mesh)
    return _sharded_traverse_impl(
        bvh_r, geom_r, rays_s, options, max_leaf, max_stack,
        _MeshCtx(device_mesh),
    )


@functools.partial(
    jax.jit, static_argnames=("options", "tile", "mesh_ctx")
)
def _sharded_wavefront_impl(packed, rays, options, tile, mesh_ctx):
    from ..traverse.wavefront import traverse_wavefront

    mesh = mesh_ctx.mesh

    def local(packed_l, rays_l):
        hits = traverse_wavefront(packed_l, rays_l, options, tile=tile)
        n_hit = jax.lax.psum(
            jnp.sum(hits.prim_id != jnp.uint32(INVALID_PRIM_ID)), RAY_AXIS
        )
        return hits, n_hit

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS)),
        out_specs=(P(RAY_AXIS), P()),
    )
    return shard_fn(packed, rays)


def sharded_traverse_wavefront(
    packed,
    rays: Rays,
    device_mesh: Mesh,
    options: BVHTraceOptions = BVHTraceOptions(),
    tile: int = 4096,
):
    """Wavefront (skip-link) engine over a sharded ray batch: packed
    tables replicated per chip, rays data-parallel over the mesh."""
    n = device_mesh.devices.size
    if rays.org.shape[0] % n:
        raise ValueError("ray batch not divisible by mesh size")
    packed_r = replicate(packed, device_mesh)
    rays_s = shard_rays(rays, device_mesh)
    return _sharded_wavefront_impl(
        packed_r, rays_s, options, tile, _MeshCtx(device_mesh)
    )


@functools.partial(
    jax.jit, static_argnames=("options", "max_leaf", "max_stack", "mesh_ctx")
)
def _sharded_render_impl(
    bvh, prims, rays, key, options, max_leaf, max_stack, mesh_ctx
):
    mesh = mesh_ctx.mesh
    intersect_fn = tri.make_triangle_intersect(
        cull_back_face=options.cull_back_face,
        exact_edge_fallback=options.exact_edge_fallback,
    )

    def trace(bvh_l, prims_l, r):
        return _stack.traverse(
            bvh_l, prims_l, r, options,
            prepare_fn=tri.triangle_prepare,
            intersect_fn=intersect_fn,
            max_leaf=max_leaf, max_stack=max_stack,
        )

    def local(bvh_l, prims_l, rays_l, key_l):
        # full render step: primary visibility + one cosine-weighted
        # occlusion bounce + shading, with cross-chip statistics
        hits = trace(bvh_l, prims_l, rays_l)
        hit = hits.prim_id != jnp.uint32(INVALID_PRIM_ID)
        fid = jnp.where(hit, hits.prim_id, 0).astype(jnp.int32)
        fv = jnp.take(prims_l.faces, fid, axis=0)
        tri_v = jnp.take(prims_l.vertices, fv, axis=0)
        n = jnp.cross(tri_v[:, 1] - tri_v[:, 0], tri_v[:, 2] - tri_v[:, 0])
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
        n = jnp.where(
            jnp.sum(n * rays_l.dir, -1, keepdims=True) > 0, -n, n
        )
        p = rays_l.org + hits.t[:, None] * rays_l.dir
        # per-chip RNG stream via the mesh position
        k = jax.random.fold_in(key_l, jax.lax.axis_index(RAY_AXIS))
        u = jax.random.uniform(k, n.shape, jnp.float32)
        d2 = n + 0.999 * (2.0 * u - 1.0)
        d2 = d2 / jnp.maximum(jnp.linalg.norm(d2, axis=-1, keepdims=True), 1e-30)
        sec = Rays(
            org=p + 1e-4 * n,
            dir=d2,
            min_t=jnp.zeros_like(hits.t),
            max_t=jnp.where(hit, jnp.float32(1e30), jnp.float32(0.0)),
        )
        occ = trace(bvh_l, prims_l, sec)
        ao = jnp.where(
            hit & (occ.prim_id == jnp.uint32(INVALID_PRIM_ID)), 1.0, 0.0
        )
        # collectives: global mean brightness + hit count ride ICI
        n_hit = jax.lax.psum(jnp.sum(hit.astype(jnp.int32)), RAY_AXIS)
        mean_ao = jax.lax.pmean(jnp.mean(ao), RAY_AXIS)
        return ao, n_hit, mean_ao

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P()),
        out_specs=(P(RAY_AXIS), P(), P()),
    )
    return shard_fn(bvh, prims, rays, key)


def sharded_render_step(
    bvh,
    mesh_geom: TriangleMesh,
    rays: Rays,
    device_mesh: Mesh,
    key=None,
    options: BVHTraceOptions = BVHTraceOptions(),
    max_leaf: int = 4,
    max_stack: int = 64,
):
    """One full data-parallel render step over the device mesh: scene
    replicated, rays sharded, primary + occlusion traversals per shard,
    psum/pmean statistics over ICI. This is the framework's "full step"
    for multi-chip validation (dryrun_multichip)."""
    n = device_mesh.devices.size
    if rays.org.shape[0] % n:
        raise ValueError("ray batch not divisible by mesh size")
    if key is None:
        key = jax.random.PRNGKey(0)
    bvh_r = replicate(bvh, device_mesh)
    geom_r = replicate(mesh_geom, device_mesh)
    rays_s = shard_rays(rays, device_mesh)
    key_r = replicate(key, device_mesh)
    return _sharded_render_impl(
        bvh_r, geom_r, rays_s, key_r, options, max_leaf, max_stack,
        _MeshCtx(device_mesh),
    )
