"""The primitive protocol: TPU-native equivalent of the reference's
Geometry/Pred/Intersector template triad (nanort.h:862-1229).

The reference plugs user primitive types into build & traverse through
duck-typed template classes. Here a primitive *kind* is a set of pure
functions over a data pytree, registered in a :class:`PrimitiveKind`:

* ``num_prims(data)``      -> int                      (host)
* ``prim_bounds(data)``    -> (bmin, bmax, centers) np (host; feeds build)
* ``prepare(data, rays)``  -> ctx pytree               (per-ray precompute,
  the reference's ``PrepareTraversal``)
* ``intersect(data, ctx, prim_ids, t_cur)`` -> (valid, t, u, v)
  (the reference's ``Intersect``; fully batched: ``prim_ids`` carries a
  trailing leaf axis, ray fields broadcast against it)

Trace-option filters (prim-id range, per-ray skip id, nanort.h:1054-1063)
are applied uniformly by the traversal, not per primitive kind — every
built-in reference intersector implements them identically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp

from ..core.options import INVALID_PRIM_ID


@dataclasses.dataclass(frozen=True)
class PrimitiveKind:
    """Static function table for one primitive type. Hashable, so jitted
    traversals can close over it."""

    name: str
    num_prims: Callable[[Any], int]
    prim_bounds: Callable[[Any], tuple]
    prepare: Callable[[Any, Any], Any]
    intersect: Callable[[Any, Any, jnp.ndarray, jnp.ndarray], tuple]


def apply_trace_filters(
    valid: jnp.ndarray,
    prim_ids: jnp.ndarray,
    prim_range: tuple,
    skip_prim_id,
) -> jnp.ndarray:
    """Prim-id range and self-intersection filters (nanort.h:1054-1063).

    ``skip_prim_id`` may be a scalar or a per-ray array broadcastable
    against ``prim_ids`` (the path tracer skips a different prim per ray).
    """
    lo, hi = prim_range
    if lo > 0:
        valid = valid & (prim_ids >= jnp.uint32(lo))
    if hi <= 0x7FFFFFFE:
        valid = valid & (prim_ids < jnp.uint32(hi))
    if skip_prim_id is None:
        return valid
    if isinstance(skip_prim_id, int):
        if skip_prim_id == INVALID_PRIM_ID:
            return valid  # statically disabled (the reference default)
        return valid & (prim_ids != jnp.uint32(skip_prim_id))
    skip = jnp.asarray(skip_prim_id, jnp.uint32)
    if skip.ndim:
        skip = skip[..., None]  # per-ray skip vs trailing leaf axis
    return valid & (prim_ids != skip)
