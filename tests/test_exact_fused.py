"""traverse_bvh8_exact_fused orchestration (the XLA gather/retrace/
scatter around the flag-only kernel). The Pallas kernel itself cannot
run on the CPU mesh, so both kernel calls are faked: the fast pass
returns corrupted records + zero-edge flags for a designated ray set,
the exact retrace returns the true records. The fused wrapper must
merge exactly the flagged rows and report capacity overflow.

Reference semantics under test: nanort.h:1093-1107 (exact edge
fallback) realized as a rare out-of-kernel retrace.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nanort_tpu.traverse import pallas_packet as pp
from nanort_tpu.core.options import BVHTraceOptions
from nanort_tpu.core.ray import Hits, Rays

pytestmark = pytest.mark.quick

LANES = pp.LANES


def _mk_rays(n):
    g = np.random.default_rng(7)
    org = g.normal(size=(n, 3)).astype(np.float32)
    d = g.normal(size=(n, 3)).astype(np.float32)
    return Rays(org=jnp.asarray(org), dir=jnp.asarray(d),
                min_t=jnp.zeros(n, jnp.float32),
                max_t=jnp.full(n, np.inf, jnp.float32))


def _true_hits(rays):
    # deterministic per-ray "truth" derived from ray data
    key = jnp.sum(rays.org, axis=-1)
    pid = (jnp.abs(key) * 1000.0).astype(jnp.uint32) % 97
    return Hits(t=key, u=key * 2, v=key * 3, prim_id=pid)


def _fake_factory(flagged_ray_idx):
    """traverse_bvh8 stand-in: fast pass corrupts flagged rays' records
    and raises their zflag; exact single pass returns the truth."""
    def fake(scene, rays, options=BVHTraceOptions(), skip_prim_id=None,
             sub=8, vmem_mb=116, *, _flag_zero_edges=False,
             exact_mode="auto", **kw):
        h = _true_hits(rays)
        n = h.t.shape[0]
        if _flag_zero_edges:
            assert not options.exact_edge_fallback
            zf = jnp.zeros(n, jnp.int32)
            if flagged_ray_idx.shape[0]:
                zf = zf.at[jnp.clip(flagged_ray_idx, 0, n - 1)].set(1)
            h = h._replace(t=jnp.where(zf > 0, -99.0, h.t),
                           prim_id=jnp.where(zf > 0, jnp.uint32(1 << 20),
                                             h.prim_id))
            return h, zf
        assert options.exact_edge_fallback and exact_mode == "single"
        return h
    return fake


@pytest.fixture
def scene():
    class S:  # only identity matters to the fakes
        nodes = leafs = None
    return S()


def test_fused_merges_only_flagged_rows(scene, monkeypatch):
    n = 64 * LANES
    flagged = np.array([5, 5 * LANES + 3, 40 * LANES + 127])
    monkeypatch.setattr(pp, "traverse_bvh8", _fake_factory(
        jnp.asarray(flagged)))
    rays = _mk_rays(n)
    h, ov = pp.traverse_bvh8_exact_fused(
        scene, rays, sub=8, fix_rows=16, fix_sub=4)
    truth = _true_hits(rays)
    assert not bool(ov)
    np.testing.assert_array_equal(np.asarray(h.t), np.asarray(truth.t))
    np.testing.assert_array_equal(np.asarray(h.prim_id),
                                  np.asarray(truth.prim_id))


def test_fused_no_flags_is_identity(scene, monkeypatch):
    n = 16 * LANES
    monkeypatch.setattr(pp, "traverse_bvh8", _fake_factory(
        jnp.asarray([], dtype=jnp.int32)))
    rays = _mk_rays(n)
    h, ov = pp.traverse_bvh8_exact_fused(
        scene, rays, sub=4, fix_rows=8, fix_sub=4)
    truth = _true_hits(rays)
    assert not bool(ov)
    np.testing.assert_array_equal(np.asarray(h.t), np.asarray(truth.t))


def test_fused_overflow_reported(scene, monkeypatch):
    n = 64 * LANES
    # flag one ray in every row: 64 rows > fix_rows=8
    flagged = jnp.arange(64) * LANES
    monkeypatch.setattr(pp, "traverse_bvh8", _fake_factory(flagged))
    rays = _mk_rays(n)
    h, ov = pp.traverse_bvh8_exact_fused(
        scene, rays, sub=8, fix_rows=8, fix_sub=4)
    assert bool(ov)
    # capacity rows ARE fixed even on overflow
    t = np.asarray(h.t)
    truth = np.asarray(_true_hits(rays).t)
    fixed_rows = np.sum([
        np.array_equal(t[r * LANES:(r + 1) * LANES],
                       truth[r * LANES:(r + 1) * LANES])
        for r in range(64)])
    assert fixed_rows == 8


def test_fused_is_jittable(scene, monkeypatch):
    n = 32 * LANES
    monkeypatch.setattr(pp, "traverse_bvh8", _fake_factory(
        jnp.asarray([3 * LANES + 1])))
    rays = _mk_rays(n)
    f = jax.jit(lambda r: pp.traverse_bvh8_exact_fused(
        scene, r, sub=8, fix_rows=8, fix_sub=4))
    h, ov = f(rays)
    truth = _true_hits(rays)
    assert not bool(ov)
    np.testing.assert_array_equal(np.asarray(h.t), np.asarray(truth.t))


def test_fused_requires_exact_option(scene):
    rays = _mk_rays(LANES)
    with pytest.raises(ValueError):
        pp.traverse_bvh8_exact_fused(
            scene, rays, options=BVHTraceOptions(exact_edge_fallback=False))
