"""Debug / sanitizer utilities (reference §5 aux: ASan/TSan cmake modules,
FP-exception trapping in the BPT example, -Weverything builds).

The JAX equivalents: NaN trapping (jax_debug_nans), host-side input
validation for ray batches, and finite-output assertions for renders.
"""

from __future__ import annotations

import contextlib

import numpy as np

import jax


@contextlib.contextmanager
def trap_nans():
    """Enable JAX NaN trapping within the scope (the BPT example's
    feenableexcept equivalent, bidir_path_tracer/main.cc:26-35)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def validate_rays(rays, allow_zero_dir: bool = True) -> None:
    """Host-side sanity checks on a ray batch; raises ValueError with a
    count + first offending index."""
    org = np.asarray(rays.org)
    d = np.asarray(rays.dir)
    if org.shape != d.shape or org.shape[-1] != 3:
        raise ValueError(f"org/dir shapes {org.shape} vs {d.shape}")
    bad = ~np.isfinite(org).all(-1) | ~np.isfinite(d).all(-1)
    if bad.any():
        i = int(np.argwhere(bad.reshape(-1))[0])
        raise ValueError(f"{bad.sum()} non-finite rays (first at {i})")
    if not allow_zero_dir:
        zero = (d == 0).all(-1)
        if zero.any():
            i = int(np.argwhere(zero.reshape(-1))[0])
            raise ValueError(f"{zero.sum()} zero-direction rays (first at {i})")
    mn = np.asarray(rays.min_t)
    mx = np.asarray(rays.max_t)
    if (mn > mx).any():
        raise ValueError("min_t > max_t for some rays")


def assert_finite_image(img, name: str = "image") -> None:
    a = np.asarray(img)
    if not np.isfinite(a).all():
        n = (~np.isfinite(a)).sum()
        raise AssertionError(f"{name}: {n} non-finite values")
