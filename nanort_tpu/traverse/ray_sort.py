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
from ..core.rowpack import pack_rows, permute_rows, unpermute_rows  # noqa: F401 (re-export)


def ray_sort_keys(
    rays: Rays, scene_lo, scene_hi, octant_major: bool = False
) -> jnp.ndarray:
    """uint32 sort keys: dead bit (31) . origin Morton (15 bits) .
    octant (3 bits) — or octant-major (octant above Morton) when
    ``octant_major``: bounce batches with many rays per origin cell
    (AO/PT hemisphere fans) pack better when packets share slab-select
    direction first.

    Rays whose interval is already empty (max_t <= min_t — the megabatch
    renderers' convention for terminated paths and inactive NEE samples)
    sort LAST: they cluster into all-dead packets that the kernel
    terminates in one step, so a bounce round's cost tracks the live-ray
    count instead of the batch size."""
    org = rays.org.reshape(-1, 3)
    d = rays.dir.reshape(-1, 3)
    dead = (rays.max_t <= rays.min_t).reshape(-1)
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
    if octant_major:
        key = (octant << 15) | morton
    else:
        key = (morton << 3) | octant
    return key | (dead.astype(jnp.uint32) << 31)


def sort_rays(rays: Rays, scene_lo, scene_hi, octant_major: bool = False):
    """Returns (sorted flat rays, order, unsort fn for result pytrees)."""
    bs = rays.batch_shape
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[len(bs):]), rays
    )
    keys = ray_sort_keys(flat, scene_lo, scene_hi, octant_major)
    order = jnp.argsort(keys)
    sorted_rays = permute_rows(flat, order)

    def unsort(tree):
        out = unpermute_rows(tree, order)
        return jax.tree_util.tree_map(
            lambda x: x.reshape(bs + x.shape[1:]), out
        )

    return sorted_rays, order, unsort


def traverse_bvh8_sorted(scene8, rays: Rays, *args, **kwargs) -> Hits:
    """Sort -> Pallas packet traversal -> unsort. The drop-in incoherent
    entry point for the fast kernel."""
    from .pallas_packet import traverse_bvh8

    lo = scene8.nodes[0, 0:3]  # root bbox (child-0 lower bound is a
    hi = scene8.nodes[0, 3:6]  # fine proxy; exactness doesn't matter)
    skip = kwargs.pop("skip_prim_id", None)
    octant_major = kwargs.pop("octant_major", False)
    sorted_rays, order, unsort = sort_rays(rays, lo, hi, octant_major)
    if skip is not None:
        skip = jnp.take(jnp.asarray(skip).reshape(-1), order)
    hits = traverse_bvh8(scene8, sorted_rays, *args, skip_prim_id=skip, **kwargs)
    return unsort(hits)
