"""PBR metallic-roughness shading model."""

import jax.numpy as jnp
import numpy as np

from nanort_tpu import build_triangle_bvh
from nanort_tpu.io.procedural import make_cornell_box, make_uv_sphere, merge_meshes
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.models.pbr import PBRMaterial, render_pbr, shade_pbr
from nanort_tpu.ops.triangle import TriangleMesh


def test_shade_energy_and_fresnel():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    v = jnp.asarray([[0.0, 0.0, 1.0]])
    l = jnp.asarray([[0.0, 0.0, 1.0]])
    base = jnp.asarray([[0.8, 0.2, 0.2]])
    # dielectric, rough: mostly diffuse, reddish
    c = np.asarray(shade_pbr(n, v, l, base, jnp.asarray([0.0]), jnp.asarray([0.9])))
    assert c[0, 0] > c[0, 1] and (c >= 0).all() and np.isfinite(c).all()
    # full metal: diffuse term vanishes -> color from fresnel(base)
    cm = np.asarray(shade_pbr(n, v, l, base, jnp.asarray([1.0]), jnp.asarray([0.3])))
    assert (cm >= 0).all() and np.isfinite(cm).all()
    # grazing light contributes less than head-on
    lg = jnp.asarray([[0.0, 0.995, 0.0999]])
    cg = np.asarray(shade_pbr(n, v, lg / jnp.linalg.norm(lg), base,
                              jnp.asarray([0.0]), jnp.asarray([0.9])))
    assert cg.sum() < c.sum()


def test_render_pbr_scene():
    v, f = merge_meshes(make_cornell_box(2.0), make_uv_sphere(12, 24, 0.5))
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh)
    cam = look_at(eye=(0, 0, 2.4), center=(0, 0, 0), width=32, height=32, fov=60)
    rays = pinhole_rays(cam)
    mat = PBRMaterial(
        base_color=jnp.asarray([0.7, 0.7, 0.7]),
        metallic=jnp.asarray(0.1),
        roughness=jnp.asarray(0.5),
    )
    aovs, hits = render_pbr(bvh, mesh, rays, mat)
    img = np.asarray(aovs["rgb"])
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.mean() > 0.01
    # shadows: sphere blocks the light for some floor pixels -> those
    # pixels are ambient-only (strictly darker than lit floor pixels)
    no_shadow, _ = render_pbr(bvh, mesh, rays, mat, shadows=False)
    diff = np.asarray(no_shadow["rgb"]).sum() - img.sum()
    assert diff > 0, "shadow rays removed no energy"


def test_per_face_materials():
    v, f = make_uv_sphere(8, 16)
    mesh = TriangleMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f))
    bvh, _ = build_triangle_bvh(mesh)
    F = len(f)
    mat = PBRMaterial(
        base_color=jnp.tile(jnp.asarray([[0.1, 0.9, 0.1]]), (F, 1)),
        metallic=jnp.zeros(F),
        roughness=jnp.full(F, 0.7),
    )
    cam = look_at(eye=(0, 0, 3), center=(0, 0, 0), width=16, height=16, fov=45)
    aovs, _ = render_pbr(bvh, mesh, pinhole_rays(cam), mat, shadows=False)
    img = np.asarray(aovs["rgb"])
    m = img.sum(-1) > 0
    assert (img[m][:, 1] > img[m][:, 0]).all()  # green dominates
