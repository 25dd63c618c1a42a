"""Ray sorting for incoherent batches (wavefront ray reordering).

Packet traversal lives and dies by coherence: a packet of unrelated rays
traverses the union of all their tree paths. The classic fix (wavefront
path tracing, Garanzha & Loop 2010) is to sort rays by a spatial-
directional key so neighboring rays share geometry again, trace sorted,
and scatter results back. Key: 3x5-bit Morton of the quantized origin
interleaved, concatenated with the 3-bit direction octant (origin cell
first so packets share subtrees, octant second so slab selects agree).

This is the bridge that lets secondary bounces (AO, path tracing) use
the fast Pallas packet kernel instead of the per-ray wavefront engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.ray import Hits, Rays


def ray_sort_keys(rays: Rays, scene_lo, scene_hi) -> jnp.ndarray:
    """uint32 sort keys: origin Morton (15 bits) . octant (3 bits)."""
    org = rays.org.reshape(-1, 3)
    d = rays.dir.reshape(-1, 3)
    lo = jnp.asarray(scene_lo, org.dtype)
    ext = jnp.maximum(jnp.asarray(scene_hi, org.dtype) - lo, 1e-30)
    q = jnp.clip((org - lo) / ext * 32.0, 0.0, 31.0).astype(jnp.uint32)

    from ..build.lbvh import _expand_bits  # 10-bit spread works for 5 bits

    morton = (
        (_expand_bits(q[:, 0]) << 2)
        | (_expand_bits(q[:, 1]) << 1)
        | _expand_bits(q[:, 2])
    )
    octant = (
        (d[:, 0] < 0).astype(jnp.uint32) * 4
        + (d[:, 1] < 0).astype(jnp.uint32) * 2
        + (d[:, 2] < 0).astype(jnp.uint32)
    )
    return (morton << 3) | octant


def sort_rays(rays: Rays, scene_lo, scene_hi):
    """Returns (sorted flat rays, order, unsort fn for result pytrees)."""
    bs = rays.batch_shape
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[len(bs):]), rays
    )
    keys = ray_sort_keys(flat, scene_lo, scene_hi)
    order = jnp.argsort(keys)
    sorted_rays = jax.tree_util.tree_map(
        lambda x: jnp.take(x, order, axis=0), flat
    )
    inv = jnp.argsort(order)

    def unsort(tree):
        return jax.tree_util.tree_map(
            lambda x: jnp.take(x, inv, axis=0).reshape(bs + x.shape[1:]), tree
        )

    return sorted_rays, order, unsort


def traverse_bvh8_sorted(scene8, rays: Rays, *args, **kwargs) -> Hits:
    """Sort -> Pallas packet traversal -> unsort. The drop-in incoherent
    entry point for the fast kernel."""
    from .pallas_packet import traverse_bvh8

    lo = scene8.nodes[0, 0:3]  # root bbox (child-0 lower bound is a
    hi = scene8.nodes[0, 3:6]  # fine proxy; exactness doesn't matter)
    skip = kwargs.pop("skip_prim_id", None)
    sorted_rays, order, unsort = sort_rays(rays, lo, hi)
    if skip is not None:
        skip = jnp.take(jnp.asarray(skip).reshape(-1), order)
    hits = traverse_bvh8(scene8, sorted_rays, *args, skip_prim_id=skip, **kwargs)
    return unsort(hits)
