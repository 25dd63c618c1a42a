"""Test configuration: force an 8-device virtual CPU mesh.

Per the build charter, multi-chip sharding is validated on a virtual CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) — the reference
never needed this trick because it has no distributed layer (SURVEY.md §4).

The environment's sitecustomize registers the 'axon' TPU plugin and forces
``jax_platforms="axon,cpu"``; we override the config back to pure CPU
*after* the jax import (env vars alone are ignored).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # fp64 paths (double_precision parity)
