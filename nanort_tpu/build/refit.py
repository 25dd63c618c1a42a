"""BVH refit: update node bounds for deformed geometry, fixed topology.

The reference rebuilds from scratch on any change; for animated meshes a
refit (SURVEY.md §7 step 6 "LBVH + refit") is the standard cheap path:
leaf bounds recompute from the new primitive bounds, internal bounds
re-union bottom-up. Vectorized as depth-bounded fixed-point passes like
build/lbvh's refit (no per-node recursion).

Refitted trees keep the exact traversal contract (topology, leaf ranges,
preorder) — quality degrades only as the geometry diverges from what the
tree was built for.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bvh import BVH


@functools.partial(jax.jit, static_argnames=("max_leaf", "n_passes"))
def _refit_jit(bmin, bmax, flag, data, indices, prim_bmin, prim_bmax,
               max_leaf: int, n_passes: int):
    n = flag.shape[0]
    is_leaf = flag == 1
    count = jnp.where(is_leaf, data[:, 0], 0).astype(jnp.int32)
    offset = jnp.where(is_leaf, data[:, 1], 0).astype(jnp.int32)

    # leaf bounds: union over the (static-capped) leaf window
    lo = jnp.full((n, 3), 3e38, bmin.dtype)
    hi = jnp.full((n, 3), -3e38, bmin.dtype)
    for k in range(max_leaf):
        valid = is_leaf & (k < count)
        pid = jnp.take(indices, jnp.minimum(offset + k, indices.shape[0] - 1))
        plo = jnp.take(prim_bmin, pid.astype(jnp.int32), axis=0)
        phi = jnp.take(prim_bmax, pid.astype(jnp.int32), axis=0)
        lo = jnp.where(valid[:, None], jnp.minimum(lo, plo), lo)
        hi = jnp.where(valid[:, None], jnp.maximum(hi, phi), hi)

    l = data[:, 0].astype(jnp.int32)
    r = data[:, 1].astype(jnp.int32)

    def up(_, st):
        lo, hi = st
        llo = jnp.take(lo, l, axis=0)
        lhi = jnp.take(hi, l, axis=0)
        rlo = jnp.take(lo, r, axis=0)
        rhi = jnp.take(hi, r, axis=0)
        nlo = jnp.minimum(llo, rlo)
        nhi = jnp.maximum(lhi, rhi)
        return (
            jnp.where(is_leaf[:, None], lo, nlo),
            jnp.where(is_leaf[:, None], hi, nhi),
        )

    lo, hi = jax.lax.fori_loop(0, n_passes, up, (lo, hi))
    return lo, hi


def refit_bvh(bvh: BVH, prim_bmin, prim_bmax, max_leaf: int | None = None,
              max_depth: int | None = None) -> BVH:
    """New BVH with the same topology and bounds refit to the given
    primitive AABBs. Runs jitted on the default backend."""
    flag = np.asarray(bvh.flag)
    data = np.asarray(bvh.data)
    if max_leaf is None:
        max_leaf = int(data[flag == 1, 0].max(initial=1))
    if max_depth is None:
        from ..core.bvh import stats_from_bvh

        max_depth = stats_from_bvh(bvh).max_tree_depth + 1
    lo, hi = _refit_jit(
        jnp.asarray(bvh.bmin), jnp.asarray(bvh.bmax),
        jnp.asarray(flag, jnp.int32), jnp.asarray(data).astype(jnp.int32),
        jnp.asarray(bvh.indices).astype(jnp.int32),
        jnp.asarray(prim_bmin), jnp.asarray(prim_bmax),
        max_leaf, max_depth,
    )
    return BVH(
        bmin=np.asarray(lo), bmax=np.asarray(hi),
        flag=np.asarray(bvh.flag), axis=np.asarray(bvh.axis),
        data=np.asarray(bvh.data), indices=np.asarray(bvh.indices),
    )
