"""r4: probe Mosaic primitives the lane-parallel frustum node phase
needs: (a) pltpu.roll direction on the lane axis, (b) vector
shift_left with per-lane shift amounts, (c) broadcasted_iota % math.

Run: python tools/exp_r4_rollprobe.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(x_ref, r3_ref, sh_ref, io_ref):
    x = x_ref[:]
    r3_ref[:] = pltpu.roll(x, 3, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    mod6 = lane % 6
    w = lane // 6
    wt = jnp.where((mod6 == 0) & (lane < 96),
                   jax.lax.shift_left(jnp.int32(1), w), 0)
    sh_ref[:] = wt
    io_ref[:] = mod6


def main():
    x = jnp.arange(128, dtype=jnp.float32).reshape(1, 128)
    out = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
        ),
    )(x)
    r3, sh, io = (np.asarray(o)[0] for o in out)
    print("roll(x,3)[0:8] =", r3[:8].tolist(), "(x[l]=l)")
    # if r3[3] == 0 -> lane L reads L-3 (np.roll style); if r3[0] == 3 ->
    # lane L reads L+3
    print("shift_left lanes 0,6,12,90,96:",
          [int(sh[i]) for i in (0, 6, 12, 90, 96)])
    print("mod6[0:13]:", io[:13].tolist())


if __name__ == "__main__":
    main()
