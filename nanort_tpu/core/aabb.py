"""Robust ray-AABB slab test.

Vectorized re-derivation of the reference's ``IntersectRayAABB`` float and
double specializations (nanort.h:2278-2370), which implement Ize, "Robust
BVH Ray Traversal", JCGT 2013:

* slab entry/exit planes selected by the per-axis ray direction sign,
* exit distances inflated by a 4-ulp multiplier (1.00000024 in f32,
  1.0000000000000004 in f64),
* NaN-filtering max/min folds (``safemax``/``safemin``, nanort.h:1236-1243)
  so 0*inf NaNs from in-plane rays never poison the interval.

Everything broadcasts: rays and boxes may carry arbitrary leading batch
dims, so one call tests a whole VPU tile of rays against a node, or a tile
of nodes against a ray.
"""

from __future__ import annotations

import jax.numpy as jnp


def max_mult(dtype) -> float:
    """4-ulp robust exit-plane multiplier (nanort.h:2303-2305, 2347-2348)."""
    if jnp.finfo(dtype).bits >= 64:
        return 1.0000000000000004
    return 1.00000024


def intersect_ray_aabb(
    bmin: jnp.ndarray,
    bmax: jnp.ndarray,
    org: jnp.ndarray,
    inv_dir: jnp.ndarray,
    dir_neg: jnp.ndarray,
    min_t: jnp.ndarray,
    max_t: jnp.ndarray,
):
    """Slab test. Args broadcast; trailing axis is xyz.

    ``dir_neg`` is the boolean per-axis sign (``ray.dir < 0``, the
    reference's ``dir_sign``). Returns ``(hit, tmin, tmax)``.
    """
    dt = org.dtype
    near = jnp.where(dir_neg, bmax, bmin)
    far = jnp.where(dir_neg, bmin, bmax)
    t_near = (near - org) * inv_dir
    t_far = (far - org) * inv_dir * jnp.array(max_mult(dt), dt)

    # safemax fold: NaN lanes compare false and keep the accumulator,
    # i.e. behave as -inf for the max / +inf for the min.
    neg_inf = jnp.array(-jnp.inf, dt)
    pos_inf = jnp.array(jnp.inf, dt)
    t_near = jnp.where(jnp.isnan(t_near), neg_inf, t_near)
    t_far = jnp.where(jnp.isnan(t_far), pos_inf, t_far)

    tmin = jnp.maximum(jnp.max(t_near, axis=-1), min_t)
    tmax = jnp.minimum(jnp.min(t_far, axis=-1), max_t)
    return tmin <= tmax, tmin, tmax
