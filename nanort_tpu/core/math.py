"""Core vector math for the TPU-native ray tracing framework.

These are the JAX equivalents of the reference's scalar vector helpers
(/root/reference/nanort.h:321-472): everything here operates on batched
``(..., 3)`` arrays so it vectorizes onto the TPU VPU lanes instead of
looping per component.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3-vector dot product over the trailing axis."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3-vector cross product over the trailing axis."""
    return jnp.cross(a, b)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(dot(a, a))


def normalize(a: jnp.ndarray, eps: float = 1e-17) -> jnp.ndarray:
    """Normalize; leaves near-zero vectors unchanged (reference
    ``vnormalize`` guards with len > 1e-17, nanort.h:390-398)."""
    n = length(a)[..., None]
    return jnp.where(n > eps, a / jnp.where(n > eps, n, 1.0), a)


def safe_inverse(v: jnp.ndarray) -> jnp.ndarray:
    """Zero-safe reciprocal of a ray direction.

    Semantics of the reference ``vsafe_inverse`` (nanort.h:409-466):
    components with ``|v| < eps`` map to ``copysign(inf, v)`` (so ``-0.0``
    maps to ``-inf``), everything else to ``1/v``. This keeps the
    slab test free of 0*inf NaNs except in the degenerate in-plane case,
    which the NaN-filtering min/max in :mod:`nanort_tpu.core.aabb` absorbs.
    """
    dt = v.dtype
    eps = jnp.finfo(dt).eps
    inf = jnp.array(jnp.inf, dt)
    tiny = jnp.abs(v) < eps
    signed_inf = jnp.copysign(inf, v)
    # Avoid the division producing inf/NaN warnings on the tiny lanes.
    denom = jnp.where(tiny, jnp.ones((), dt), v)
    return jnp.where(tiny, signed_inf, jnp.ones((), dt) / denom)


def surface_area(bmin: jnp.ndarray, bmax: jnp.ndarray) -> jnp.ndarray:
    """Surface area of an AABB batch (reference ``CalculateSurfaceArea``,
    nanort.h:1277-1282)."""
    d = bmax - bmin
    return 2.0 * (
        d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]
    )
