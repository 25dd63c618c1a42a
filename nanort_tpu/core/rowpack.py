"""Packed row permutation for SoA pytrees.

TPU scalar gathers/scatters move ~110M elem/s on v5e while (R, C)-row
gathers move ~12x more per index.  Any permutation of a struct-of-arrays
(rays, hits, build records) should therefore ride ONE packed (R, C)
matrix instead of one gather per field.  Used by the ray sorter
(traverse/ray_sort.py), the treelet engine's slot fill, and the
device-side builder's record sort.

The packed matrix is int32, NOT f32: gather/scatter of f32 can
canonicalize NaN payloads on TPU (uint32 0xFFFFFFFF — the miss
prim_id — bitcast to f32 is a NaN and came back a different NaN),
while integer lanes are always moved bit-exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_rows(tree):
    """Flatten a pytree of (R, ...) leaves into one (R, C) i32 matrix.

    4-byte leaves are bitcast into int32 columns (pure data movement, so
    any f32/uint32 bit pattern — including NaNs like the 0xFFFFFFFF miss
    sentinel — survives the round trip exactly); smaller dtypes go via
    an exact upcast, 8-byte dtypes (x64 tests) ride two i32 words.
    Returns (matrix, unpack) where unpack(m) restores the tree.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    cols, meta = [], []
    for x in leaves:
        v = x.reshape(x.shape[0], -1)
        dt = x.dtype
        if dt == jnp.int32:
            pass
        elif dt.itemsize < 4:  # bool/int8/f16/bf16: exact upcast
            if jnp.issubdtype(dt, jnp.floating):
                v = jax.lax.bitcast_convert_type(
                    v.astype(jnp.float32), jnp.int32)
            else:
                v = v.astype(jnp.int32)
        elif dt.itemsize == 4:
            v = jax.lax.bitcast_convert_type(v, jnp.int32)
        else:  # f64/i64 under x64 tests etc.: pair of i32 words
            v = jax.lax.bitcast_convert_type(v, jnp.int32).reshape(
                v.shape[0], -1)
        meta.append((dt, x.shape[1:], v.shape[1]))
        cols.append(v)
    m = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)

    def unpack(g):
        out, c = [], 0
        for dt, shp, k in meta:
            v = g[:, c:c + k]
            c += k
            if dt == jnp.int32:
                pass
            elif dt.itemsize < 4:
                if jnp.issubdtype(dt, jnp.floating):
                    v = jax.lax.bitcast_convert_type(
                        v, jnp.float32).astype(dt)
                else:
                    v = v.astype(dt)
            elif dt.itemsize == 4:
                v = jax.lax.bitcast_convert_type(v, dt)
            else:
                v = jax.lax.bitcast_convert_type(
                    v.reshape(v.shape[0], -1, 2), dt)
            out.append(v.reshape((g.shape[0],) + shp))
        return jax.tree_util.tree_unflatten(treedef, out)

    return m, unpack


def permute_rows(tree, order):
    """Gather every (R, ...) leaf by ``order`` via one packed row gather."""
    m, unpack = pack_rows(tree)
    return unpack(jnp.take(m, order, axis=0))


def unpermute_rows(tree, order):
    """Inverse of ``permute_rows`` — one packed row *scatter* (out[order[i]]
    = in[i]), so no inverse permutation ever needs computing."""
    m, unpack = pack_rows(tree)
    return unpack(jnp.zeros_like(m).at[order].set(m))
