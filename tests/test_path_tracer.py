"""Path tracer: physical sanity + reference-semantics checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanort_tpu.io.procedural import make_cornell_pt_scene
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.models.path_tracer import (
    collect_light_faces,
    make_pt_scene,
    render_path_traced,
    trace_paths,
)


@pytest.fixture(scope="module")
def scene():
    v, f, mids, mats = make_cornell_pt_scene()
    return make_pt_scene(v, f, mids, mats)


def test_light_face_collection(scene):
    v, f, mids, mats = make_cornell_pt_scene()
    lf = collect_light_faces(mids, scene.materials)
    assert (np.asarray(mids)[lf] == 3).all() and len(lf) == 2


def test_direct_light_visibility(scene):
    # a ray straight up at the light: first bounce emission
    org = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    c = trace_paths(scene, org, d, jax.random.PRNGKey(0), max_bounces=2)
    c = np.asarray(c)[0]
    # hits the light head-on: radiance = cos(0) * emission
    np.testing.assert_allclose(c, [14.0, 13.0, 11.0], rtol=1e-5)


def test_ray_to_dark_corner_no_emission_leak(scene):
    # a single-bounce budget ray at a non-emissive wall yields ~0 direct
    # emission but may get NEE light; with 0 bounces remaining color = 0
    org = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    c = trace_paths(scene, org, d, jax.random.PRNGKey(1), max_bounces=0)
    assert np.asarray(c).sum() == 0.0


def test_render_statistics(scene):
    cam = look_at(
        eye=(0.0, 0.0, 2.2), center=(0.0, 0.0, 0.0), width=24, height=24, fov=55
    )
    rays = pinhole_rays(cam)
    img = np.asarray(
        render_path_traced(scene, rays, jax.random.PRNGKey(2), spp=12, max_bounces=5)
    )
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.mean() > 0.01, "render is black"
    # color bleeding: left third should be redder, right third greener
    left = img[:, :8].mean(axis=(0, 1))
    right = img[:, -8:].mean(axis=(0, 1))
    assert left[0] > left[1], f"no red bleed: {left}"
    assert right[1] > right[0], f"no green bleed: {right}"


def test_table_path_matches_gather_path(scene):
    # PTScene.face_table/light_table are derived caches; stripping them
    # falls back to the legacy per-field gathers. Table CONTENTS are
    # bit-identical to the gathers (checked first); the end-to-end trace
    # is allowed ulp-level drift only (XLA fuses the two programs
    # differently), never branch divergence — a different lobe pick
    # would show up as an O(1) radiance difference.
    assert scene.face_table is not None and scene.light_table is not None
    fid = jnp.arange(scene.mesh.num_faces, dtype=jnp.int32)
    from nanort_tpu.models.path_tracer import _rows_by_id

    rows = np.asarray(_rows_by_id(scene.face_table, fid))
    mid = jnp.take(scene.material_ids, fid)
    fc = jnp.take(scene.mesh.faces, fid, axis=0)
    tri = jnp.take(scene.mesh.vertices, fc, axis=0)
    gn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-30)
    np.testing.assert_array_equal(rows[:, 0:3], np.asarray(gn))
    np.testing.assert_array_equal(
        rows[:, 3:6], np.asarray(jnp.take(scene.materials.diffuse, mid, axis=0)))
    np.testing.assert_array_equal(
        rows[:, 6:9], np.asarray(jnp.take(scene.materials.emission, mid, axis=0)))
    np.testing.assert_array_equal(
        rows[:, 15], np.asarray(jnp.take(scene.materials.ior, mid)))

    stripped = scene._replace(face_table=None, light_table=None)
    org = jnp.zeros((128, 3), jnp.float32)
    rng = np.random.default_rng(7)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    a = np.asarray(trace_paths(scene, org, d, jax.random.PRNGKey(5), max_bounces=6))
    b = np.asarray(trace_paths(stripped, org, d, jax.random.PRNGKey(5), max_bounces=6))
    assert np.abs(a - b).max() <= 1e-5, np.abs(a - b).max()


def test_energy_decreases_without_light():
    # same scene rebuilt with the light's emission zeroed -> black render
    # (rebuild through make_pt_scene: the shading tables are derived from
    # the materials, so editing materials in place would go stale)
    v, f, mids, mats = make_cornell_pt_scene()
    mats = dict(mats)
    mats["emission"] = np.zeros_like(np.asarray(mats["emission"]))
    dark = make_pt_scene(v, f, mids, mats)
    org = jnp.zeros((64, 3), jnp.float32)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = trace_paths(dark, org, jnp.asarray(d), jax.random.PRNGKey(3), max_bounces=6)
    assert np.asarray(c).max() == 0.0
