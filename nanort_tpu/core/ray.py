"""SoA ray batches and hit records.

The reference traces one ``Ray<T>`` at a time (nanort.h:474-496); a TPU
traces megabatches. ``Rays`` is a structure-of-arrays pytree over a batch
shape ``(...,)`` so whole batches live in VMEM tiles and the VPU operates
on 8x128 lanes of origins/directions at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .options import INVALID_PRIM_ID

# Ray type bitmask (nanort.h:85-94).
RAY_TYPE_NONE = 0x0
RAY_TYPE_PRIMARY = 0x1
RAY_TYPE_SECONDARY = 0x2
RAY_TYPE_DIFFUSE = 0x4
RAY_TYPE_REFLECTION = 0x8
RAY_TYPE_REFRACTION = 0x10


class Rays(NamedTuple):
    """A batch of rays. ``org``/``dir``: (..., 3); ``min_t``/``max_t``: (...,)."""

    org: jnp.ndarray
    dir: jnp.ndarray
    min_t: jnp.ndarray
    max_t: jnp.ndarray

    @property
    def batch_shape(self):
        return self.org.shape[:-1]

    @property
    def dtype(self):
        return self.org.dtype


def make_rays(org, dir, min_t=None, max_t=None, dtype=None) -> Rays:
    """Build a ``Rays`` batch with reference defaults (min_t=0, max_t=+max)."""
    org = jnp.asarray(org, dtype)
    dir = jnp.asarray(dir, org.dtype)
    bs = org.shape[:-1]
    dt = org.dtype
    if min_t is None:
        min_t = jnp.zeros(bs, dt)
    else:
        min_t = jnp.broadcast_to(jnp.asarray(min_t, dt), bs)
    if max_t is None:
        max_t = jnp.full(bs, jnp.finfo(dt).max, dt)
    else:
        max_t = jnp.broadcast_to(jnp.asarray(max_t, dt), bs)
    return Rays(org, dir, min_t, max_t)


class Hits(NamedTuple):
    """Hit records matching ``TriangleIntersection<T>`` (nanort.h:996-1005):
    ``t``/``u``/``v`` floats, ``prim_id`` uint32 (0xFFFFFFFF = miss)."""

    t: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    prim_id: jnp.ndarray

    @property
    def hit(self) -> jnp.ndarray:
        # uint32 literal: a bare Python 0xFFFFFFFF overflows the default
        # int32 weak type when x64 is disabled
        return self.prim_id != jnp.uint32(INVALID_PRIM_ID)


def no_hits(batch_shape, dtype=jnp.float32, init_t=None) -> Hits:
    """All-miss hit record; ``t`` initialized to ``max_t`` like the
    reference's ``intersector.Update(ray.max_t, -1)`` (nanort.h:2501)."""
    if init_t is None:
        init_t = jnp.full(batch_shape, jnp.finfo(dtype).max, dtype)
    return Hits(
        t=jnp.asarray(init_t, dtype),
        u=jnp.zeros(batch_shape, dtype),
        v=jnp.zeros(batch_shape, dtype),
        prim_id=jnp.full(batch_shape, INVALID_PRIM_ID, jnp.uint32),
    )


# NamedTuples are native JAX pytrees; no registration required.
del jax
