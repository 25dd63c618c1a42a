"""Golden parity vs the actual C++ reference (lighttransport/nanort).

Compiles tools/ref_harness.cc against the read-only reference header,
feeds it the same scene + rays as our kernels, and compares:
  * hit records (t, u, v, prim_id) — the same primitive must win (modulo
    exact t ties, which are traversal-order dependent, nanort.h:1131-1139)
    and t/u/v must agree within 4 ulps: XLA contracts mul+add into FMA
    while g++ -O2 does its own contraction, so the two float32 pipelines
    legitimately differ in the last bits (measured max 2.9e-7 relative);
  * the reference's serialized BVH loads through our ``load`` and our
    traversal over the *reference-built tree* reproduces its hits.
Skipped when g++ or the reference checkout is unavailable.
"""

import os
import struct
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from nanort_tpu import load, make_rays, traverse_triangles, validate
from nanort_tpu.io.procedural import (
    make_cornell_box,
    make_random_triangles,
    make_uv_sphere,
    merge_meshes,
)
from nanort_tpu.ops.triangle import TriangleMesh

REF = "/root/reference"
HARNESS = "/tmp/nanort_ref_harness"


def _build_harness():
    if os.path.exists(HARNESS):
        return True
    if not os.path.exists(os.path.join(REF, "nanort.h")):
        return False
    src = os.path.join(os.path.dirname(__file__), "..", "tools", "ref_harness.cc")
    r = subprocess.run(
        ["g++", "-O2", "-std=c++11", "-DNANORT_ENABLE_SERIALIZATION",
         f"-I{REF}", src, "-o", HARNESS],
        capture_output=True, text=True,
    )
    return r.returncode == 0


pytestmark = [
    pytest.mark.skipif(
        not _build_harness(), reason="reference or g++ unavailable"
    ),
    pytest.mark.quick,  # the cheap parity gate: pytest -m quick
]


def _run_reference(v, f, rays, tmpdir):
    nv, nf, nr = len(v), len(f), rays.org.reshape(-1, 3).shape[0]
    inp = os.path.join(tmpdir, "in.bin")
    hits_p = os.path.join(tmpdir, "hits.bin")
    bvh_p = os.path.join(tmpdir, "bvh.bin")
    with open(inp, "wb") as fp:
        fp.write(struct.pack("<Q", nv))
        fp.write(np.asarray(v, np.float32).tobytes())
        fp.write(struct.pack("<Q", nf))
        fp.write(np.asarray(f, np.uint32).tobytes())
        fp.write(struct.pack("<Q", nr))
        fp.write(np.asarray(rays.org, np.float32).tobytes())
        fp.write(np.asarray(rays.dir, np.float32).tobytes())
        fp.write(np.asarray(rays.min_t, np.float32).tobytes())
        fp.write(np.asarray(rays.max_t, np.float32).tobytes())
    r = subprocess.run([HARNESS, inp, hits_p, bvh_p], capture_output=True)
    assert r.returncode == 0, f"harness rc={r.returncode}"
    rec = np.frombuffer(open(hits_p, "rb").read(), np.uint8).view(np.float32)
    rec = rec.reshape(nr, 4)
    t = rec[:, 0].copy()
    u = rec[:, 1].copy()
    vv = rec[:, 2].copy()
    pid = rec[:, 3].view(np.uint32).copy()
    return (t, u, vv, pid), bvh_p


def _rays_for(scene_span, n, seed):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-scene_span, scene_span, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-scene_span * 0.3, scene_span * 0.3, (n, 3))
    d = tgt - org
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return make_rays(org, d.astype(np.float32))


@pytest.mark.parametrize("kind", ["box", "sphere", "mixed", "soup"])
def test_hit_records_match_cpp_reference(kind, tmp_path):
    if kind == "box":
        v, f = make_cornell_box()
    elif kind == "sphere":
        v, f = make_uv_sphere(14, 28)
    elif kind == "mixed":
        v, f = merge_meshes(make_cornell_box(), make_uv_sphere(10, 20, 0.5))
    else:
        v, f = make_random_triangles(1200, seed=3)
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    rays = _rays_for(3.0, 512, seed=17)
    (rt, ru, rv, rpid), bvh_path = _run_reference(v, f, rays, str(tmp_path))

    # 1) our traversal over the REFERENCE-BUILT tree (loaded via the
    # serialization interop) must reproduce its hits
    ref_bvh = load(bvh_path)
    validate(ref_bvh, num_prims=len(f))
    got = traverse_triangles(ref_bvh, mesh, rays)
    gh = np.asarray(got.hit)
    rh = rpid != 0xFFFFFFFF
    np.testing.assert_array_equal(gh, rh)
    m = gh
    same = np.asarray(got.prim_id)[m] == rpid[m]
    # same tree, same leaf order: expect overwhelmingly identical prims
    assert same.mean() > 0.999, f"prim agreement {same.mean()}"
    ULP4 = 5e-7
    np.testing.assert_allclose(np.asarray(got.t)[m][same], rt[m][same], rtol=ULP4)
    np.testing.assert_allclose(np.asarray(got.u)[m][same], ru[m][same], rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.v)[m][same], rv[m][same], rtol=1e-5, atol=2e-5)
    if (~same).any():  # equal-t ties only
        np.testing.assert_allclose(
            np.asarray(got.t)[m][~same], rt[m][~same], rtol=1e-6
        )

    # 2) our own SAH tree must produce hits matching the reference's
    from nanort_tpu import build_triangle_bvh

    ours, _ = build_triangle_bvh(mesh)
    got2 = traverse_triangles(ours, mesh, rays)
    np.testing.assert_array_equal(np.asarray(got2.hit), rh)
    m2 = rh
    same2 = np.asarray(got2.prim_id)[m2] == rpid[m2]
    np.testing.assert_allclose(
        np.asarray(got2.t)[m2][same2], rt[m2][same2], rtol=5e-7
    )
    if (~same2).any():
        np.testing.assert_allclose(
            np.asarray(got2.t)[m2][~same2], rt[m2][~same2], rtol=1e-6
        )


def test_wavefront_matches_cpp_reference(tmp_path):
    v, f = merge_meshes(make_cornell_box(), make_uv_sphere(12, 24, 0.5))
    rays = _rays_for(3.0, 700, seed=23)
    (rt, ru, rv, rpid), _ = _run_reference(v, f, rays, str(tmp_path))

    from nanort_tpu import build_triangle_bvh
    from nanort_tpu.ops.triangle import TriangleMesh
    from nanort_tpu.traverse.packed import pack_scene
    from nanort_tpu.traverse.wavefront import traverse_wavefront

    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh)
    got = traverse_wavefront(pack_scene(bvh, v, f), rays, tile=256)
    rh = rpid != 0xFFFFFFFF
    np.testing.assert_array_equal(np.asarray(got.hit), rh)
    m = rh
    same = np.asarray(got.prim_id)[m] == rpid[m]
    np.testing.assert_allclose(np.asarray(got.t)[m][same], rt[m][same], rtol=5e-7)
    np.testing.assert_allclose(np.asarray(got.u)[m][same], ru[m][same], rtol=1e-5, atol=2e-5)
    if (~same).any():
        np.testing.assert_allclose(
            np.asarray(got.t)[m][~same], rt[m][~same], rtol=1e-6
        )
