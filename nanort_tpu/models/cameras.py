"""The 7 pluggable camera models of the reference GUI renderer.

Behavioral re-derivation of examples/gui/camera.{h,cc} (camera registry at
camera.h:174-208): Pinhole ("perspective"), Orthographic, Spherical,
SphericalPanorama, Cylindrical, FishEye (linear), FishEyeMKX22 (the iZugar
MKX22 220-degree polynomial model). Each model is a pure vectorized
function mapping pixel coordinates to a ray batch; on TPU a whole frame's
rays are generated in one fused VPU pass instead of one virtual call per
pixel (gui/camera.h:31).

Conventions (matching the reference):
* camera basis: ``u`` = right, ``v`` = up, ``w`` = *backward* (the
  reference's rotation-matrix column 2); the camera looks along ``-w``.
* ``eye = look_at + w * distance`` (camera.cc:23-37).
* pixel coords xy in [0, W) x [0, H) with y up; callers pass pixel
  centers (x + 0.5, y + 0.5).
* ``fov`` is the vertical field of view in degrees.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.math import normalize
from ..core.ray import Rays, make_rays


class Camera(NamedTuple):
    """Camera pose + image geometry. All fields static-friendly floats."""

    eye: jnp.ndarray  # (3,)
    u: jnp.ndarray  # (3,) right
    v: jnp.ndarray  # (3,) up
    w: jnp.ndarray  # (3,) backward (view dir = -w)
    width: int
    height: int
    fov: float  # vertical fov, degrees


def look_at(
    eye, center, up=(0.0, 1.0, 0.0), width=512, height=512, fov=45.0,
    dtype=jnp.float32,
) -> Camera:
    eye = np.asarray(eye, np.float64)
    center = np.asarray(center, np.float64)
    up = np.asarray(up, np.float64)
    w = eye - center
    w = w / np.linalg.norm(w)
    u = np.cross(up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    return Camera(
        eye=jnp.asarray(eye, dtype),
        u=jnp.asarray(u, dtype),
        v=jnp.asarray(v, dtype),
        w=jnp.asarray(w, dtype),
        width=int(width),
        height=int(height),
        fov=float(fov),
    )


def pixel_grid(cam: Camera, dtype=jnp.float32):
    """(H, W) pixel-center coordinates, y-up (row 0 = top of image)."""
    x = jnp.arange(cam.width, dtype=dtype) + 0.5
    y = (cam.height - 1 - jnp.arange(cam.height, dtype=dtype)) + 0.5
    return jnp.meshgrid(x, y, indexing="xy")


def _flen(cam: Camera) -> float:
    """Distance at which one pixel is one unit (camera.cc:95)."""
    return 0.5 * cam.height / math.tan(0.5 * math.radians(cam.fov))


def pinhole_rays(cam: Camera, xy=None) -> Rays:
    """Standard perspective camera (camera.cc:89-126)."""
    x, y = pixel_grid(cam) if xy is None else xy
    flen = _flen(cam)
    corner = (
        -cam.w * flen - 0.5 * (cam.width * cam.u + cam.height * cam.v)
    )
    d = corner + x[..., None] * cam.u + y[..., None] * cam.v
    d = normalize(d)
    org = jnp.broadcast_to(cam.eye, d.shape)
    return make_rays(org, d)


def orthographic_rays(cam: Camera, distance: float = 1.0, xy=None) -> Rays:
    """Parallel rays; pixel footprint from fov at ``distance``
    (camera.cc:128-162)."""
    x, y = pixel_grid(cam) if xy is None else xy
    px = 2.0 * distance * math.tan(0.5 * math.radians(cam.fov)) / cam.height
    corner = cam.eye - 0.5 * px * (cam.width * cam.u + cam.height * cam.v)
    org = corner + px * x[..., None] * cam.u + px * y[..., None] * cam.v
    # "+ 0.0" scrubs -0.0 components: copysign-based safe_inverse treats
    # -0.0 as negative while the dir<0 slab selector does not, which would
    # mispair the slab planes for exactly-axis-aligned parallel rays
    d = jnp.broadcast_to(-cam.w + 0.0, org.shape)
    return make_rays(org, d)


def _cam_dir_to_world(cam: Camera, d_cam: jnp.ndarray) -> jnp.ndarray:
    """Rotate a camera-space direction (x right, y up, -z forward) to world."""
    return (
        d_cam[..., 0:1] * cam.u + d_cam[..., 1:2] * cam.v + d_cam[..., 2:3] * cam.w
    )


def spherical_rays(cam: Camera, xy=None) -> Rays:
    """Equal-angle mapping; horizontal lines stay straight
    (camera.cc:202-241)."""
    x, y = pixel_grid(cam) if xy is None else xy
    vfov = math.radians(cam.fov)
    d_ang = vfov / cam.height
    hfov = vfov * cam.width / cam.height
    a0 = hfov / 2.0 - x * d_ang
    a1 = -vfov / 2.0 + y * d_ang
    d_cam = jnp.stack(
        [
            -jnp.sin(a0),
            jnp.cos(a0) * jnp.sin(a1),
            -jnp.cos(a0) * jnp.cos(a1),
        ],
        axis=-1,
    )
    d = _cam_dir_to_world(cam, d_cam)
    return make_rays(jnp.broadcast_to(cam.eye, d.shape), d)


def spherical_panorama_rays(cam: Camera, xy=None) -> Rays:
    """Equal-angle mapping; vertical lines stay straight — the photo-stitch
    panorama projection (camera.cc:164-200)."""
    x, y = pixel_grid(cam) if xy is None else xy
    vfov = math.radians(cam.fov)
    d_ang = vfov / cam.height
    hfov = vfov * cam.width / cam.height
    a0 = hfov / 2.0 - x * d_ang
    a1 = -vfov / 2.0 + y * d_ang
    d_cam = jnp.stack(
        [
            -jnp.cos(a1) * jnp.sin(a0),
            jnp.sin(a1),
            -jnp.cos(a0) * jnp.cos(a1),
        ],
        axis=-1,
    )
    d = _cam_dir_to_world(cam, d_cam)
    return make_rays(jnp.broadcast_to(cam.eye, d.shape), d)


def cylindrical_rays(cam: Camera, xy=None) -> Rays:
    """Spherical horizontally, pinhole vertically (camera.cc:243-287)."""
    x, y = pixel_grid(cam) if xy is None else xy
    vfov = math.radians(cam.fov)
    hfov = vfov * cam.width / cam.height
    d_ang = hfov / cam.width
    angle = hfov / 2.0 - x * d_ang
    px = 2.0 * math.tan(vfov / 2.0) / cam.height
    corner1 = math.tan(vfov / 2.0)
    d_cam = jnp.stack(
        [-jnp.sin(angle), px * y - corner1, -jnp.cos(angle)], axis=-1
    )
    d = normalize(_cam_dir_to_world(cam, d_cam))
    return make_rays(jnp.broadcast_to(cam.eye, d.shape), d)


def _fisheye_common(cam: Camera, xy, angle_of_rnorm):
    x, y = pixel_grid(cam) if xy is None else xy
    cx, cy = cam.width / 2.0, cam.height / 2.0
    dx = cx - x
    dy = cy - y
    r = jnp.sqrt(dx * dx + dy * dy)
    r_factor = 1.0 / (cx if cam.height < cam.width else cy)
    r_norm = r * r_factor
    angle, in_range = angle_of_rnorm(r_norm)
    r_safe = jnp.where(r > 0, r, 1.0)
    nx, ny = dx / r_safe, dy / r_safe
    s = jnp.sin(angle)
    d_cam = jnp.stack([-s * nx, -s * ny, -jnp.cos(angle)], axis=-1)
    # out-of-range pixels get a zero direction, like the reference
    # (camera.cc:320-327) — safe_inverse turns it into an instant miss
    d_cam = jnp.where(in_range[..., None], d_cam, 0.0)
    d = _cam_dir_to_world(cam, d_cam)
    return make_rays(jnp.broadcast_to(cam.eye, d.shape), d)


def fisheye_rays(cam: Camera, xy=None) -> Rays:
    """Linear fisheye: angle proportional to radius (camera.cc:289-330)."""
    fov = math.radians(cam.fov)

    def angle_fn(rn):
        angle = rn * fov / 2.0
        return angle, angle <= math.pi / 2.0

    return _fisheye_common(cam, xy, angle_fn)


def fisheye_mkx22_rays(cam: Camera, xy=None) -> Rays:
    """iZugar MKX22 220-degree lens: quartic radius->angle polynomial
    (camera.cc:331-375; coefficients from Bourke's fisheyerectify note)."""

    def angle_fn(rn):
        angle = 1.3202 * rn + 1.4539 * rn**2 - 2.9949 * rn**3 + 2.1007 * rn**4
        return angle, rn <= 1.0

    return _fisheye_common(cam, xy, angle_fn)


# Registry keyed by the reference's type names (camera.h:47-208).
CAMERA_REGISTRY: dict[str, Callable] = {
    "perspective": pinhole_rays,
    "orthographic": orthographic_rays,
    "spherical": spherical_rays,
    "spherical-panorama": spherical_panorama_rays,
    "cylindrical": cylindrical_rays,
    "fish-eye": fisheye_rays,
    "fish-eye MKX22": fisheye_mkx22_rays,
}


def generate_rays(cam: Camera, camera_type: str = "perspective", **kw) -> Rays:
    """Name-based dispatch like the reference's setCameraFromStr
    (camera.cc:39-61); unknown names fall back to perspective."""
    fn = CAMERA_REGISTRY.get(camera_type, pinhole_rays)
    return fn(cam, **kw)


def vr_omnistereo_rays(width: int, height: int, ipd: float = 0.0635,
                       dtype=jnp.float32) -> Rays:
    """Omnidirectional stereo panorama (reference examples/vrcamera/
    main.cc:552-585): top half = left eye, bottom half = right eye; eyes
    offset on a circle of diameter ``ipd`` (inter-pupillary distance,
    meters); equirectangular direction mapping."""
    x = jnp.arange(width, dtype=dtype)
    y = jnp.arange(height, dtype=dtype)
    gx, gy = jnp.meshgrid(x, y, indexing="xy")
    is_left = gy < (height / 2)
    screen_y = 2.0 * (gy / height) - 1.0
    theta = 2.0 * jnp.pi * (gx / width)
    theta_off = theta + jnp.where(is_left, 0.0, jnp.pi)
    phi = (jnp.mod(2.0 * (0.5 * screen_y + 0.5), 1.0) - 0.5) * jnp.pi
    org = jnp.stack(
        [
            0.5 * ipd * (-jnp.cos(theta_off)),
            jnp.zeros_like(theta),
            0.5 * ipd * jnp.sin(theta_off),
        ],
        -1,
    )
    d = jnp.stack(
        [
            jnp.cos(phi) * -jnp.sin(theta),
            jnp.sin(phi),
            jnp.cos(phi) * -jnp.cos(theta),
        ],
        -1,
    )
    d = normalize(d)
    return make_rays(org.astype(dtype), d.astype(dtype))
