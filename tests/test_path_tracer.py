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


def test_energy_decreases_without_light(scene):
    # same scene with the light's emission zeroed -> black render
    dark = scene._replace(
        materials=scene.materials._replace(
            emission=jnp.zeros_like(scene.materials.emission)
        )
    )
    org = jnp.zeros((64, 3), jnp.float32)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = trace_paths(dark, org, jnp.asarray(d), jax.random.PRNGKey(3), max_bounces=6)
    assert np.asarray(c).max() == 0.0
