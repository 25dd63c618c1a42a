"""Cheap ambient-HBM probe for the shared axon chip.

memory_stats() returns zeros through the tunnel, so the only signal is
allocation success. Allocates 1 GB chunks up to NANORT_PROBE_GB
(default 8), FORCES materialization with a scalar readback each (lazy
overcommit otherwise reports success), frees everything, prints one
JSON line {"free_gb_at_least": N}. ~seconds on a quiet chip.
"""
import json
import os
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

target = int(os.environ.get("NANORT_PROBE_GB", 8))
# allocate ON-DEVICE (a device_put would stream 1 GB through the
# tunnel, ~10s+/GB); donate-free nothing — hold all chunks, then free
alloc = jax.jit(lambda s: jnp.full((1024, 1024, 256), s, jnp.float32))
held = []
got = 0
try:
    for i in range(target):
        x = alloc(jnp.float32(i))
        float(x[0, 0, 0])  # force through the tunnel
        held.append(x)
        got += 1
except Exception as e:
    print(f"# stopped at {got} GB: {type(e).__name__}", file=sys.stderr)
del held
print(json.dumps({"free_gb_at_least": got, "probe_target_gb": target}))
