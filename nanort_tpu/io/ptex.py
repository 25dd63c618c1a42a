"""Per-face texturing (Ptex-style) for raycast hits.

The reference's ptex example (examples/ptex/, 4.3k LoC) links Disney's
libPtex to look up per-face textures on tri/quad meshes — without the
external lib it doesn't build there either. This module provides the
capability natively:

* ``FaceTextures``: per-face texel grids (independent power-of-two
  resolutions per face, like Ptex), padded into one device array for
  gather-friendly lookups.
* ``sample``: vectorized bilinear filtering in face-local (u, v) with
  edge clamp, driven straight from Hits (prim_id, u, v) — including the
  triangle->quad pairing the reference uses (two consecutive triangles
  form one quad face; the second triangle's barycentrics map to the
  quad's upper parametric half).
* a compact zlib container (``save_ptex_npz``/``load_ptex_npz``) as the
  on-disk cache (the Ptex *file format* itself is proprietary-complex;
  the reference depends on an external reader for it too).
"""

from __future__ import annotations

import io as _io
import zlib
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class FaceTextures(NamedTuple):
    """Per-face texel grids, padded to a common (res_max, res_max, C).

    texels: (F, R, R, C) f32; ures/vres: (F,) true per-face resolutions
    (<= R). Lookups scale (u, v) by the true resolution so each face
    keeps its own texel density, exactly like Ptex per-face res."""

    texels: jnp.ndarray
    ures: jnp.ndarray
    vres: jnp.ndarray

    @property
    def num_faces(self) -> int:
        return self.texels.shape[0]


def build_face_textures(faces_texels: list[np.ndarray]) -> FaceTextures:
    """Pack a list of per-face (u_res, v_res, C) arrays (power-of-two
    resolutions, common channel count) into a FaceTextures."""
    if not faces_texels:
        raise ValueError("no faces")
    chans = {t.shape[2] for t in faces_texels}
    if len(chans) != 1:
        raise ValueError(f"mixed channel counts {chans}")
    for t in faces_texels:
        for r in t.shape[:2]:
            if r & (r - 1) or r == 0:
                raise ValueError(f"face res {t.shape[:2]} not power of two")
    rmax = max(max(t.shape[0], t.shape[1]) for t in faces_texels)
    c = chans.pop()
    packed = np.zeros((len(faces_texels), rmax, rmax, c), np.float32)
    ures = np.zeros(len(faces_texels), np.int32)
    vres = np.zeros(len(faces_texels), np.int32)
    for i, t in enumerate(faces_texels):
        ur, vr = t.shape[0], t.shape[1]
        packed[i, :ur, :vr] = t
        ures[i], vres[i] = ur, vr
    return FaceTextures(
        texels=jnp.asarray(packed),
        ures=jnp.asarray(ures),
        vres=jnp.asarray(vres),
    )


def sample(tex: FaceTextures, face_id, u, v):
    """Bilinear per-face lookup at face-local (u, v) in [0, 1]^2.
    face_id/u/v broadcast; returns (..., C). Out-of-range face ids
    return zeros (miss-safe)."""
    fid = jnp.asarray(face_id).astype(jnp.int32)
    ok = (fid >= 0) & (fid < tex.num_faces)
    f = jnp.where(ok, fid, 0)
    ur = jnp.take(tex.ures, f).astype(jnp.float32)
    vr = jnp.take(tex.vres, f).astype(jnp.float32)
    x = jnp.clip(u, 0.0, 1.0) * ur - 0.5
    y = jnp.clip(v, 0.0, 1.0) * vr - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi0 = jnp.clip(x0.astype(jnp.int32), 0, None)
    yi0 = jnp.clip(y0.astype(jnp.int32), 0, None)
    xi1 = jnp.minimum(xi0 + 1, (ur - 1).astype(jnp.int32))
    yi1 = jnp.minimum(yi0 + 1, (vr - 1).astype(jnp.int32))
    xi0 = jnp.minimum(xi0, (ur - 1).astype(jnp.int32))
    yi0 = jnp.minimum(yi0, (vr - 1).astype(jnp.int32))

    def tap(xi, yi):
        return tex.texels[f, xi, yi]

    c00 = tap(xi0, yi0)
    c10 = tap(xi1, yi0)
    c01 = tap(xi0, yi1)
    c11 = tap(xi1, yi1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )
    return jnp.where(ok[..., None], out, 0.0)


def sample_tri_hits(tex: FaceTextures, hits, quad_faces: bool = True):
    """Shade Hits from a triangulated mesh. With ``quad_faces`` each
    consecutive triangle pair (2k, 2k+1) is one ptex face (the
    reference's quad handling): triangle 2k covers the (0,0)-(1,0)-(1,1)
    half with (u, v) = barycentric (u, v) mapped to quad params, and
    triangle 2k+1 the opposite half."""
    pid = jnp.asarray(hits.prim_id).astype(jnp.int32)
    u = hits.u
    v = hits.v
    if quad_faces:
        face = pid // 2
        second = (pid % 2) == 1
        # quad (v0,v1,v2,v3) triangulated (v0,v1,v2)+(v0,v2,v3) with
        # params v0=(0,0) v1=(1,0) v2=(1,1) v3=(0,1):
        #   tri 2k:   P = v0 + u(v1-v0) + v(v2-v0) -> (s,t) = (u+v, v)
        #   tri 2k+1: P = v0 + u(v2-v0) + v(v3-v0) -> (s,t) = (u, u+v)
        qu = jnp.where(second, u, u + v)
        qv = jnp.where(second, u + v, v)
    else:
        face = pid
        qu, qv = u, v
    valid = hits.prim_id != jnp.uint32(0xFFFFFFFF)
    face = jnp.where(valid, face, -1)
    return sample(tex, face, qu, qv)


# ---------------------------------------------------------------------------
# on-disk container
# ---------------------------------------------------------------------------


def save_ptex_npz(path: str, tex: FaceTextures) -> None:
    buf = _io.BytesIO()
    np.savez(
        buf,
        texels=np.asarray(tex.texels),
        ures=np.asarray(tex.ures),
        vres=np.asarray(tex.vres),
    )
    with open(path, "wb") as f:
        f.write(b"NTPX1\x00")
        f.write(zlib.compress(buf.getvalue(), 6))


def load_ptex_npz(path: str) -> FaceTextures:
    with open(path, "rb") as f:
        head = f.read(6)
        if head != b"NTPX1\x00":
            raise ValueError("not a nanort-tpu ptex container")
        data = zlib.decompress(f.read())
    z = np.load(_io.BytesIO(data))
    return FaceTextures(
        texels=jnp.asarray(z["texels"]),
        ures=jnp.asarray(z["ures"]),
        vres=jnp.asarray(z["vres"]),
    )
