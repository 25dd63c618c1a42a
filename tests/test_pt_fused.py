"""Fused path-tracer megakernel (models/pt_fused.py) vs the XLA
megabatch path. The kernel runs in interpret mode on the CPU test mesh —
the SAME code path that compiles on TPU — and uses a deterministic
counter-based RNG, so images agree with trace_paths statistically (same
estimator, different uniform stream; reference semantics from
path_tracer/main.cc:785-1009)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanort_tpu.io.procedural import make_cornell_pt_scene
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.models.path_tracer import (
    make_pt_scene,
    render_path_traced,
    trace_paths,
)
from nanort_tpu.models.pt_fused import (
    PT_FUSED_MAX_TRIS,
    fused_eligible,
    render_fused,
)


@pytest.fixture(scope="module")
def cornell():
    sv, sf, mids, mats = make_cornell_pt_scene(2.0)
    return make_pt_scene(sv, sf, mids, mats)


@pytest.fixture(scope="module")
def cam_rays():
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=24, height=24, fov=45.0)
    pr = pinhole_rays(cam)
    return pr.org.reshape(-1, 3), pr.dir.reshape(-1, 3)


def test_fused_matches_xla_statistically(cornell, cam_rays):
    org, d = cam_rays
    R = org.shape[0]
    spp = 24
    c_f = np.asarray(render_fused(cornell, org, d, 7, spp, max_bounces=6))
    oa = jnp.broadcast_to(jnp.asarray(org)[None], (spp, R, 3)).reshape(-1, 3)
    da = jnp.broadcast_to(jnp.asarray(d)[None], (spp, R, 3)).reshape(-1, 3)
    c_x = np.asarray(
        trace_paths(cornell, oa, da, jax.random.PRNGKey(5), max_bounces=6)
    ).reshape(spp, R, 3).mean(0)
    assert not np.isnan(c_f).any()
    # same estimator, independent uniform streams: global means converge
    rel = abs(c_f.mean() - c_x.mean()) / max(c_x.mean(), 1e-9)
    assert rel < 0.05, (c_f.mean(), c_x.mean())
    # per-pixel agreement at Monte-Carlo noise scale
    assert np.abs(c_f - c_x).mean() < 0.15 * max(c_x.mean(), 1e-9) + 0.05


def test_fused_deterministic(cornell, cam_rays):
    org, d = cam_rays
    a = np.asarray(render_fused(cornell, org, d, 42, 4, max_bounces=3))
    b = np.asarray(render_fused(cornell, org, d, 42, 4, max_bounces=3))
    c = np.asarray(render_fused(cornell, org, d, 43, 4, max_bounces=3))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0


def test_fused_accepts_prng_key(cornell, cam_rays):
    org, d = cam_rays
    a = render_fused(cornell, org, d, jax.random.PRNGKey(9), 2,
                     max_bounces=2)
    assert a.shape == (org.shape[0], 3)
    assert not np.isnan(np.asarray(a)).any()


def test_fused_ragged_ray_count(cornell, cam_rays):
    org, d = cam_rays
    a_full = np.asarray(render_fused(cornell, org, d, 11, 4, max_bounces=3))
    a_cut = np.asarray(
        render_fused(cornell, org[:100], d[:100], 11, 4, max_bounces=3))
    # same rays, same seed -> identical prefix (padding must not bleed in)
    np.testing.assert_array_equal(a_cut, a_full[:100])


def test_trig_poly_matches_native(cornell, cam_rays):
    org, d = cam_rays
    a = np.asarray(render_fused(cornell, org[:64], d[:64], 3, 4,
                                max_bounces=3, trig="native"))
    b = np.asarray(render_fused(cornell, org[:64], d[:64], 3, 4,
                                max_bounces=3, trig="poly"))
    # identical RNG stream; only the ~4e-6 sincos approximation differs,
    # which can flip a rare low-probability branch — compare loosely
    assert np.quantile(np.abs(a - b), 0.99) < 2e-2
    assert np.abs(a - b).mean() < 2e-3


def test_eligibility_gate(cornell):
    assert fused_eligible(cornell)
    big = cornell._replace(face_table=None)
    assert not fused_eligible(big)
    with pytest.raises(ValueError):
        render_fused(big, np.zeros((4, 3)), np.ones((4, 3)), 0, 1)
    assert PT_FUSED_MAX_TRIS >= 256


def test_render_path_traced_fused_route(cornell):
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=8, height=8, fov=45.0)
    img = render_path_traced(
        cornell, pinhole_rays(cam), jax.random.PRNGKey(0), spp=4,
        max_bounces=3, fused=True)
    assert img.shape == (8, 8, 3)
    assert not np.isnan(np.asarray(img)).any()


# ---------------------------------------------------------------------
# BVH-traced fused kernel (render_fused_bvh): same RNG stream and the
# same Möller–Trumbore ops as the brute kernel, traversal replacing the
# all-triangles sweep — images must be bit-identical except for paths
# that hit an exactly-equal-t shared edge (tie order: traversal vs prim
# order, the repo-wide contract) and their chaotic descendants.
# ---------------------------------------------------------------------

def _attach_bvh_tables(scene, sv, sf, mids):
    from nanort_tpu import BVHBuildOptions, build_triangle_bvh
    from nanort_tpu.build.bvh8 import collapse_bvh8
    from nanort_tpu.traverse.fused_trace import build_aux_rows

    v = np.asarray(sv)
    f = np.asarray(sf)
    bvh, _ = build_triangle_bvh(
        scene.mesh, BVHBuildOptions(min_leaf_primitives=4,
                                    max_leaf_primitives=4))
    s8 = collapse_bvh8(bvh, v, f, width=16)
    aux = build_aux_rows(
        s8.leafs, mids, f, v, s8.max_leaf,
        gn_unit=np.asarray(scene.face_table[:, 0:3], np.float32))
    s8 = s8._replace(nodes=jnp.asarray(s8.nodes),
                     leafs=jnp.asarray(s8.leafs))
    return scene._replace(scene8=s8, fused_aux=jnp.asarray(aux))


def test_fused_bvh_matches_brute(cam_rays):
    from nanort_tpu.models.pt_fused import (
        fused_bvh_eligible,
        render_fused_bvh,
    )

    sv, sf, mids, mats = make_cornell_pt_scene(2.0)
    scene = _attach_bvh_tables(make_pt_scene(sv, sf, mids, mats),
                               sv, sf, mids)
    assert fused_bvh_eligible(scene)
    org, d = cam_rays
    img_b = np.asarray(render_fused(scene, org, d, 7, 6, max_bounces=4))
    img_v = np.asarray(
        render_fused_bvh(scene, org, d, 7, 6, max_bounces=4))
    assert not np.isnan(img_v).any()
    same = img_b == img_v
    # the bulk of the image is bit-identical; only tie-hit paths diverge
    assert same.mean() > 0.9, same.mean()
    rel = abs(img_v.mean() - img_b.mean()) / max(img_b.mean(), 1e-9)
    assert rel < 0.05, (img_v.mean(), img_b.mean())


def test_fused_bvh_spp_lanes_statistical(cam_rays):
    """Sample-major packing (spp_lanes=K) replicates pixels across lanes
    and cuts the sample loop by K; per-lane RNG streams differ from the
    K=1 layout by design, so images agree statistically, not bitwise."""
    from nanort_tpu.models.pt_fused import render_fused_bvh

    sv, sf, mids, mats = make_cornell_pt_scene(2.0)
    scene = _attach_bvh_tables(make_pt_scene(sv, sf, mids, mats),
                               sv, sf, mids)
    org, d = cam_rays
    img1 = np.asarray(
        render_fused_bvh(scene, org, d, 7, 8, max_bounces=4))
    imgk = np.asarray(
        render_fused_bvh(scene, org, d, 7, 8, max_bounces=4,
                         spp_lanes=4))
    assert not np.isnan(imgk).any()
    rel = abs(imgk.mean() - img1.mean()) / max(img1.mean(), 1e-9)
    assert rel < 0.15, (imgk.mean(), img1.mean())
    with pytest.raises(ValueError):
        render_fused_bvh(scene, org, d, 7, 7, spp_lanes=4)


# ---------------------------------------------------------------------
# Watchdog spp-chunking (path_tracer._fused_bvh_spp_chunk): the axon
# worker kills fused launches running much past ~2 min, so
# render_path_traced splits spp into equal watchdog-sized launches and
# averages (tools/experiments/pt_fused_scale.md).
# ---------------------------------------------------------------------

def test_fused_bvh_spp_chunk_math():
    from nanort_tpu.models.path_tracer import _fused_bvh_spp_chunk

    class _S:
        def __init__(self, f):
            self.mesh = type("M", (), {"num_faces": f})()

    # config-B protocol scene: single launch at full spp (bit-identical
    # to the unchunked path)
    assert _fused_bvh_spp_chunk(_S(974), 100, 512 * 512, 10) == 100
    # the measured 100K point: 4 x spp=25 (31.5 s/launch green; one
    # spp=100 launch = ~126 s = dead worker)
    assert _fused_bvh_spp_chunk(_S(99_980), 100, 512 * 512, 10) == 25
    # cheap bounces widen the budget: mb=2 at 100K ran 17 s in one
    # launch (exp_r5_midscale_probe s100_b2)
    assert _fused_bvh_spp_chunk(_S(99_980), 100, 512 * 512, 2) == 100
    # prime spp has no mid divisor: fall to per-sample launches
    assert _fused_bvh_spp_chunk(_S(99_980), 97, 512 * 512, 10) == 1
    # 4x the pixels shrinks the per-launch spp budget
    assert (_fused_bvh_spp_chunk(_S(99_980), 100, 4 * 512 * 512, 10)
            <= 10)


def test_render_path_traced_chunked_statistical(monkeypatch):
    """Force a 2-chunk split on a tiny BVH-route scene: the averaged
    image must agree statistically with the single-launch render (the
    chunks use independent fold_in keys by design)."""
    import nanort_tpu.models.path_tracer as ptmod
    from nanort_tpu.models.pt_fused import (
        fused_bvh_eligible,
        render_fused_bvh,
    )

    sv, sf, mids, mats = make_cornell_pt_scene(2.0)
    scene = _attach_bvh_tables(make_pt_scene(sv, sf, mids, mats),
                               sv, sf, mids)
    # drop the brute table so the router takes the BVH branch
    scene = scene._replace(face_table=None)
    assert fused_bvh_eligible(scene)

    calls = []
    real = ptmod._fused_bvh_spp_chunk

    def fake(sc, spp, n_rays, mb):
        calls.append(spp)
        return min(2, spp)

    monkeypatch.setattr(ptmod, "_fused_bvh_spp_chunk", fake)
    cam = look_at(eye=(0, 0.0, 5.0), center=(0, 0, 0),
                  width=8, height=8, fov=45.0)
    img_c = np.asarray(render_path_traced(
        scene, pinhole_rays(cam), jax.random.PRNGKey(0), spp=4,
        max_bounces=3, fused=True))
    assert calls and calls[0] == 4  # the 2-chunk split engaged
    monkeypatch.setattr(ptmod, "_fused_bvh_spp_chunk", real)
    img_1 = np.asarray(render_path_traced(
        scene, pinhole_rays(cam), jax.random.PRNGKey(0), spp=4,
        max_bounces=3, fused=True))
    assert img_c.shape == img_1.shape == (8, 8, 3)
    assert not np.isnan(img_c).any()
    rel = abs(img_c.mean() - img_1.mean()) / max(img_1.mean(), 1e-9)
    assert rel < 0.35, (img_c.mean(), img_1.mean())
