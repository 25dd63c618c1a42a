"""PBR metallic-roughness shading on raycast hits.

The reference's pbr_surface example ports the Khronos glTF-WebGL-PBR
reference shader to CPU ray hits (examples/pbr_surface/, ~1.2k LoC). Same
model here as batched VPU math: Lambert diffuse + Cook-Torrance specular
with Trowbridge-Reitz (GGX) distribution, Smith-Schlick geometric term
and Schlick fresnel, a single directional light plus an ambient term, and
an optional BVH shadow ray. Whole-frame evaluation in one jitted pass.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math import normalize
from ..core.options import BVHTraceOptions
from ..core.ray import Rays, make_rays
from ..ops.triangle import TriangleMesh
from ..traverse.stack import traverse_triangles
from .objrender import MeshAttributes, render_aovs


class PBRMaterial(NamedTuple):
    base_color: jnp.ndarray  # (3,) or per-face (F, 3)
    metallic: jnp.ndarray  # scalar or (F,)
    roughness: jnp.ndarray  # scalar or (F,)


def shade_pbr(n, v, l, base_color, metallic, roughness, light_color=1.0):
    """Khronos-style metallic-roughness BRDF * NdotL. All (..., 3)/(...)."""
    h = normalize(v + l)
    ndl = jnp.clip(jnp.sum(n * l, -1), 1e-4, 1.0)
    ndv = jnp.clip(jnp.abs(jnp.sum(n * v, -1)), 1e-4, 1.0)
    ndh = jnp.clip(jnp.sum(n * h, -1), 0.0, 1.0)
    vdh = jnp.clip(jnp.sum(v * h, -1), 0.0, 1.0)

    alpha = jnp.maximum(roughness * roughness, 1e-3)
    a2 = (alpha * alpha)[..., None] if jnp.ndim(alpha) else alpha * alpha

    f0 = 0.04 * (1.0 - metallic[..., None]) + base_color * metallic[..., None]
    # Schlick fresnel
    F = f0 + (1.0 - f0) * (1.0 - vdh[..., None]) ** 5
    # GGX / Trowbridge-Reitz NDF
    a2s = jnp.broadcast_to(jnp.asarray(alpha * alpha), ndh.shape)
    dd = ndh * ndh * (a2s - 1.0) + 1.0
    D = a2s / jnp.maximum(jnp.pi * dd * dd, 1e-8)
    # Smith-Schlick geometric attenuation
    k = jnp.broadcast_to(jnp.asarray(alpha), ndh.shape) / 2.0
    G = (ndl / (ndl * (1 - k) + k)) * (ndv / (ndv * (1 - k) + k))

    spec = F * (D * G / jnp.maximum(4.0 * ndl * ndv, 1e-8))[..., None]
    kd = (1.0 - F) * (1.0 - metallic[..., None])
    diffuse = kd * base_color / jnp.pi
    return (diffuse + spec) * ndl[..., None] * light_color


@functools.partial(
    jax.jit, static_argnames=("options", "max_leaf", "shadows")
)
def render_pbr(
    bvh,
    mesh: TriangleMesh,
    rays: Rays,
    material: PBRMaterial,
    light_dir=(-0.5, 0.8, 0.6),
    light_color=(3.0, 3.0, 3.0),
    ambient=(0.06, 0.06, 0.08),
    attrs: MeshAttributes | None = None,
    options: BVHTraceOptions = BVHTraceOptions(),
    max_leaf: int = 4,
    shadows: bool = True,
    scene8=None,
):
    """Primary visibility + one directional light with PBR shading.
    ``scene8`` routes traversals through the sorted packet kernel."""
    aovs, hits = render_aovs(bvh, mesh, rays, attrs, options, max_leaf, scene8)
    hit = hits.hit
    n = aovs["normal"]
    n = jnp.where(jnp.sum(n * rays.dir, -1, keepdims=True) > 0, -n, n)
    p = aovs["position"]
    v = normalize(-rays.dir)
    l = normalize(jnp.broadcast_to(jnp.asarray(light_dir, jnp.float32), n.shape))

    base = jnp.asarray(material.base_color, jnp.float32)
    if base.ndim == 2:  # per-face
        fid = jnp.where(hit, hits.prim_id, 0).astype(jnp.int32)
        base = jnp.take(base, fid, axis=0)
        metal = jnp.take(jnp.asarray(material.metallic, jnp.float32), fid)
        rough = jnp.take(jnp.asarray(material.roughness, jnp.float32), fid)
    else:
        base = jnp.broadcast_to(base, n.shape)
        metal = jnp.broadcast_to(
            jnp.asarray(material.metallic, jnp.float32), hit.shape
        )
        rough = jnp.broadcast_to(
            jnp.asarray(material.roughness, jnp.float32), hit.shape
        )

    color = shade_pbr(
        n, v, l, base, metal, rough,
        jnp.asarray(light_color, jnp.float32),
    )
    if shadows:
        eps = jnp.asarray(1e-4, jnp.float32)
        sh_rays = make_rays(
            p + eps * n, l,
            min_t=jnp.zeros(hit.shape, jnp.float32),
            max_t=jnp.where(hit, 1e30, 0.0),
        )
        if scene8 is not None:
            from ..traverse.ray_sort import traverse_bvh8_sorted

            occ = traverse_bvh8_sorted(
                scene8, sh_rays, options, skip_prim_id=hits.prim_id,
                occlusion=True,
            )
        else:
            occ = traverse_triangles(
                bvh, mesh, sh_rays, options,
                skip_prim_id=hits.prim_id, max_leaf=max_leaf,
            )
        color = jnp.where(occ.hit[..., None], 0.0, color)

    color = color + jnp.asarray(ambient, jnp.float32) * base
    rgb = jnp.where(hit[..., None], color, 0.0)
    return {**aovs, "rgb": rgb}, hits
