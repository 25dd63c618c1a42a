"""Bidirectional path tracer — TPU re-design of examples/bidir_path_tracer.

The reference builds one eye subpath + one light subpath per pixel sample
and connects every (eye, light) vertex pair with MIS (main.cc:898-1289).
Here both random walks run as wavefronts over the full sample batch with
statically-unrolled vertex slots (so vertex storage is stack/concat, never
scatter), and each (e, l) connection strategy evaluates vectorized over
all rays with one batched visibility traversal.

Faithful semantics (citations into bidir_path_tracer/main.cc):
* subpath walk ``raytrace`` (898-1014): area-measure pdfFwd conversion
  using the *previous* vertex normal, pdfRev write-back to the previous
  vertex, eye paths store the light vertex and stop, light paths drop it
* lobe model ``sampleBRDF``/``pdfBRDF``/``Vertex::f`` (607-890): fresnel-
  weighted specular/diffuse/refraction probabilities; specular and
  refraction are delta lobes (f and pdf contribute 0 in connections);
  ``isDelta`` = any specular or transmittance component (624-630)
* uniform-area light sampling, pdfPos = 1/totalArea (692-766)
* ``calcG`` visibility: the connection ray must hit the far surface
  within kEps of the expected distance (1211-1243)
* the MIS weight recurrences with zero->one pdf substitution and delta
  skips (1081-1209); strategy (e<=2, l==0) weights 1
* constants kEps = 1e-3, cosine-hemisphere pdf = cos/pi (44, 264-280)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import normalize
from ..core.ray import Rays
from .path_tracer import PTScene, _trace

K_EPS = 1.0e-3
K_INF = 1.0e30


def _u(key, shape):
    return jax.random.uniform(key, shape, jnp.float32)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _cos_dir(key, n):
    """directionCosTheta (main.cc:264-280): simple-ONB cosine sampling;
    returns (dir, pdf = cos/pi)."""
    u1 = _u(key, n.shape[:-1])
    u2 = _u(jax.random.fold_in(key, 1), n.shape[:-1])
    phi = 2.0 * jnp.pi * u2
    r = jnp.sqrt(u1)
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(1.0 - u1)
    x_dir = jnp.where(
        (jnp.abs(n[..., 0]) < jnp.abs(n[..., 1]))[..., None],
        jnp.asarray([1.0, 0, 0], jnp.float32),
        jnp.asarray([0, 1.0, 0], jnp.float32),
    )
    y_dir = normalize(jnp.cross(n, x_dir))
    x_dir = jnp.cross(y_dir, n)
    d = x_dir * x[..., None] + y_dir * y[..., None] + n * z[..., None]
    return d, z / jnp.pi


def _reflect(i, n):
    return i - 2.0 * _dot(i, n)[..., None] * n


def _refract(i, n, eta):
    ndi = _dot(n, i)[..., None]
    k = 1.0 - eta[..., None] ** 2 * (1.0 - ndi**2)
    out = eta[..., None] * i - (eta[..., None] * ndi + jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k < 0.0, 0.0, out)


def _fresnel(h, n, r):
    r0 = r * r
    c = 1.0 - _dot(h, n)
    return r0 + (1.0 - r0) * c**5


def _mat(scene: PTScene, fid):
    m = jnp.take(scene.material_ids, fid)
    g = lambda a: jnp.take(a, m, axis=0)
    return dict(
        diffuse=g(scene.materials.diffuse),
        emission=g(scene.materials.emission),
        specular=g(scene.materials.specular),
        transmittance=g(scene.materials.transmittance),
        ior=jnp.take(scene.materials.ior, m),
        dissolve=jnp.take(scene.materials.dissolve, m),
    )


def _rhos(mat, wo, orig_n, n):
    """Fresnel-weighted lobe probabilities (main.cc:779-810). ``wo`` points
    away from the surface."""
    inside = jnp.where(_dot(-wo, orig_n) < 0, -1.0, 1.0)
    n1 = jnp.where(inside < 0, 1.0 / mat["ior"], mat["ior"])
    n2 = 1.0 / n1
    fres = _fresnel(wo, n, (n1 - n2) / (n1 + n2))
    rho_s = jnp.mean(mat["specular"], -1) * fres
    rho_d = jnp.mean(mat["diffuse"], -1) * (1.0 - fres) * (1.0 - mat["dissolve"])
    rho_r = jnp.mean(mat["transmittance"], -1) * (1.0 - fres) * mat["dissolve"]
    total = rho_s + rho_d + rho_r
    ok = total >= 1e-4
    t = jnp.where(ok, total, 1.0)
    return rho_s / t, rho_d / t, rho_r / t, ok, inside, n1


def _is_delta(mat):
    """Vertex::isDelta (main.cc:624-630)."""
    return (mat["specular"] > 0).any(-1) | (mat["transmittance"] > 0).any(-1)


def _eval_f(mat, wo, orig_n, n, wi):
    """Vertex::f (main.cc:634-689): diffuse-only (delta lobes are zero),
    reflect-side gated, lobe-weight normalized."""
    rho_s, rho_d, rho_r, ok, _, _ = _rhos(mat, wo, orig_n, n)
    reflect = _dot(wi, n) * _dot(wo, n) > 0.0
    ret = jnp.where(
        ((rho_d > 0) & reflect)[..., None],
        rho_d[..., None] * mat["diffuse"] / jnp.pi,
        0.0,
    )
    weight = jnp.where((rho_s > 0) & reflect, rho_s, 0.0)
    weight = weight + jnp.where((rho_d > 0) & reflect, rho_d, 0.0)
    weight = weight + jnp.where((rho_r > 0) & ~reflect, rho_r, 0.0)
    ret = jnp.where(
        (weight != 0)[..., None], ret / jnp.maximum(weight, 1e-30)[..., None], 0.0
    )
    return jnp.where(ok[..., None], ret, 0.0)


def _pdf_brdf(mat, wi, wo, orig_n, n):
    """pdfBRDF (main.cc:839-887): diffuse cos/pi only."""
    rho_s, rho_d, rho_r, ok, _, _ = _rhos(mat, wo, orig_n, n)
    reflect = _dot(wi, n) * _dot(wo, n) > 0.0
    pdf = jnp.where(
        (rho_d > 0) & reflect, rho_d * jnp.abs(_dot(wi, n)) / jnp.pi, 0.0
    )
    return jnp.where(ok, pdf, 0.0)


def _sample_brdf(mat, wo, orig_n, n, key):
    """sampleBRDF (main.cc:776-837). Returns (f, wi, pdf)."""
    rho_s, rho_d, rho_r, ok, inside, n1 = _rhos(mat, wo, orig_n, n)
    rand = _u(key, rho_s.shape)
    pick_s = rand < rho_s
    pick_d = ~pick_s & (rand < rho_s + rho_d)
    pick_r = ~pick_s & ~pick_d & (rand < rho_s + rho_d + rho_r)

    wi_s = _reflect(-wo, n)
    cos_s = jnp.abs(_dot(wi_s, n))
    f_s = rho_s[..., None] * mat["specular"] / jnp.maximum(cos_s, 1e-30)[..., None]
    ok_s = cos_s >= K_EPS

    wi_d, pdf_cos = _cos_dir(jax.random.fold_in(key, 2), n)
    f_d = rho_d[..., None] * mat["diffuse"] / jnp.pi

    wi_r = _refract(-wo, -inside[..., None] * orig_n, n1)
    cos_r = jnp.abs(_dot(wi_r, n))
    f_r = rho_r[..., None] * mat["transmittance"] / jnp.maximum(cos_r, 1e-30)[..., None]
    ok_r = cos_r >= K_EPS

    wi = jnp.where(pick_s[..., None], wi_s,
                   jnp.where(pick_d[..., None], wi_d, wi_r))
    f = jnp.where((pick_s & ok_s)[..., None], f_s,
                  jnp.where(pick_d[..., None], f_d,
                            jnp.where((pick_r & ok_r)[..., None], f_r, 0.0)))
    pdf = jnp.where(pick_s & ok_s, rho_s,
                    jnp.where(pick_d, pdf_cos * rho_d,
                              jnp.where(pick_r & ok_r, rho_r, 0.0)))
    pdf = jnp.where(ok, pdf, 0.0)
    return f, wi, pdf


def _light_sampler_arrays(scene: PTScene):
    """Area-weighted light CDF (LightSampler, main.cc:692-766); host."""
    lf = np.asarray(scene.light_faces)
    f = np.asarray(scene.mesh.faces)[lf]
    v = np.asarray(scene.mesh.vertices)
    tri = v[f]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 2] - tri[:, 0], tri[:, 1] - tri[:, 0]), axis=-1
    )
    total = float(area.sum())
    cdf = np.cumsum(area) / max(total, 1e-30)
    return jnp.asarray(cdf, jnp.float32), total


def _sample_light_vertex(scene: PTScene, cdf, total_area, key, R):
    """Uniform-area point on the emissive geometry (main.cc:732-766)."""
    r = _u(key, (R,))
    sid = jnp.searchsorted(cdf, r).astype(jnp.int32)
    sid = jnp.minimum(sid, cdf.shape[0] - 1)
    fid = jnp.take(scene.light_faces, sid)
    f = jnp.take(scene.mesh.faces, fid, axis=0)
    tri = jnp.take(scene.mesh.vertices, f, axis=0)
    u1 = _u(jax.random.fold_in(key, 1), (R,))
    u2 = _u(jax.random.fold_in(key, 2), (R,))
    s = jnp.sqrt(u1)
    c0 = (1.0 - s)[:, None]
    c1 = (s * (1.0 - u2))[:, None]
    c2 = (s * u2)[:, None]
    pos = c0 * tri[:, 0] + c1 * tri[:, 1] + c2 * tri[:, 2]
    if scene.facevarying_normals is not None:
        n3 = jnp.take(scene.facevarying_normals, fid, axis=0)
        nrm = c0 * n3[:, 0] + c1 * n3[:, 1] + c2 * n3[:, 2]
    else:
        nrm = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nrm = normalize(nrm)
    le = jnp.take(
        scene.materials.emission, jnp.take(scene.material_ids, fid), axis=0
    )
    pdf_pos = 1.0 / total_area
    return pos, nrm, le, pdf_pos


def _walk(scene, org0, dir0, beta0, pdf0, prev_pos0, prev_n0, is_eye, key,
          n_steps, tile, has_normals):
    """The subpath random walk (raytrace, main.cc:898-1014). Returns
    per-slot vertex arrays, each a list of length n_steps."""
    R = org0.shape[0]
    z3 = jnp.zeros((R, 3), jnp.float32)
    V = {k: [] for k in ("pos", "norm", "orig_norm", "wo", "beta", "pdf_fwd",
                         "pdf_rev", "is_light", "valid", "fid")}
    org, d = org0, dir0
    beta = beta0
    pdf_solid = pdf0
    alive = jnp.ones((R,), bool)
    prev_pos, prev_n = prev_pos0, prev_n0
    root_rev = jnp.zeros((R,), jnp.float32)

    for b in range(n_steps):
        k = jax.random.fold_in(key, 100 + b)
        hits = _trace(
            scene, org, d, jnp.full((R,), K_EPS, jnp.float32),
            jnp.where(alive, jnp.float32(K_INF), jnp.float32(0.0)), tile,
        )
        hit = hits.hit & alive
        fid = jnp.where(hit, hits.prim_id, 0).astype(jnp.int32)
        pos = org + hits.t[:, None] * d

        if has_normals:
            n3 = jnp.take(scene.facevarying_normals, fid, axis=0)
            w0 = (1.0 - hits.u - hits.v)[:, None]
            nrm = w0 * n3[:, 0] + hits.u[:, None] * n3[:, 1] + hits.v[:, None] * n3[:, 2]
        else:
            fv = jnp.take(scene.mesh.faces, fid, axis=0)
            tri = jnp.take(scene.mesh.vertices, fv, axis=0)
            nrm = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        nrm = normalize(nrm)
        orig_n = nrm
        nrm = jnp.where(_dot(nrm, d)[:, None] > 0, -nrm, nrm)

        mat = _mat(scene, fid)
        on_light = (mat["emission"] > 0).any(-1)

        # pdfFwd: solid angle -> area using the PREVIOUS vertex's normal
        # (main.cc:991-995)
        to = pos - prev_pos
        dist = jnp.linalg.norm(to, axis=-1)
        to_n = to / jnp.maximum(dist[:, None], 1e-30)
        pdf_fwd_area = pdf_solid * _dot(to_n, prev_n) / jnp.maximum(dist * dist, 1e-30)

        if is_eye:
            light_beta = beta * mat["emission"] * jnp.maximum(
                0.0, _dot(orig_n, -d)
            )[:, None]
            v_beta = jnp.where(on_light[:, None], light_beta, beta)
            v_valid = hit
        else:
            v_beta = beta
            v_valid = hit & ~on_light  # light paths drop light hits (958-960)

        V["pos"].append(pos)
        V["norm"].append(nrm)
        V["orig_norm"].append(orig_n)
        V["wo"].append(normalize(-d))
        V["beta"].append(jnp.where(v_valid[:, None], v_beta, z3))
        V["pdf_fwd"].append(jnp.where(v_valid, pdf_fwd_area, 0.0))
        V["pdf_rev"].append(jnp.zeros((R,), jnp.float32))
        V["is_light"].append(v_valid & on_light)
        V["valid"].append(v_valid)
        V["fid"].append(fid)

        # continue the walk (light hits stop eye paths too, main.cc:997)
        f, wi, pdf_new = _sample_brdf(mat, -d, orig_n, nrm, k)
        cont = hit & ~on_light & (pdf_new != 0.0)
        new_beta = f * beta * jnp.abs(_dot(nrm, wi))[:, None] / jnp.maximum(
            pdf_new, 1e-30
        )[:, None]
        cont = cont & (new_beta > 0).any(-1)

        # pdfRev write-back to the previous slot (main.cc:1005-1013)
        pdf_rev_solid = _pdf_brdf(mat, -d, wi, orig_n, nrm)
        prev_rev = pdf_rev_solid * jnp.abs(_dot(-to_n, nrm)) / jnp.maximum(
            dist * dist, 1e-30
        )
        if b > 0:
            V["pdf_rev"][b - 1] = jnp.where(
                cont, prev_rev, V["pdf_rev"][b - 1]
            )
        else:
            root_rev = jnp.where(cont, prev_rev, 0.0)

        prev_pos, prev_n = pos, nrm
        org = pos
        d = wi
        beta = jnp.where(cont[:, None], new_beta, beta)
        pdf_solid = jnp.where(cont, pdf_new, pdf_solid)
        alive = cont

    out = {k: jnp.stack(v, axis=1) for k, v in V.items()}  # (R, NB, ...)
    out["root_rev"] = root_rev  # pdfRev written back to the root vertex
    return out


def _assemble(root: dict, walk: dict, n_slots: int):
    """Prepend the root vertex to the walk arrays -> (R, 1+n_steps, ...)."""
    out = {}
    for k in ("pos", "norm", "orig_norm", "wo", "beta"):
        out[k] = jnp.concatenate([root[k][:, None], walk[k]], axis=1)
    out["pdf_fwd"] = jnp.concatenate(
        [root["pdf_fwd"][:, None], walk["pdf_fwd"]], axis=1
    )
    out["pdf_rev"] = jnp.concatenate(
        [walk["root_rev"][:, None], walk["pdf_rev"]], axis=1
    )
    out["valid"] = jnp.concatenate(
        [jnp.ones_like(walk["valid"][:, :1]), walk["valid"]], axis=1
    )
    out["is_light"] = jnp.concatenate(
        [root["is_light"][:, None], walk["is_light"]], axis=1
    )
    out["fid"] = jnp.concatenate(
        [jnp.zeros_like(walk["fid"][:, :1]), walk["fid"]], axis=1
    )
    out["is_root"] = jnp.concatenate(
        [jnp.ones_like(walk["valid"][:, :1]),
         jnp.zeros_like(walk["valid"])], axis=1
    )
    return out


def _slot(V, i):
    return {k: v[:, i] for k, v in V.items()}


def _vert_delta(scene, v):
    return jnp.where(v["is_root"], False, _is_delta(_mat(scene, v["fid"])))


def _vert_f(scene, v, target_pos):
    """Vertex::f toward a target position (main.cc:634-689)."""
    wi = normalize(target_pos - v["pos"])
    return _eval_f(_mat(scene, v["fid"]), v["wo"], v["orig_norm"], v["norm"], wi)


def _vert_pdf(scene, v, wi_pos, wo_pos):
    """pdfBRDF with wi/wo toward the given positions, converted to area
    measure at wo_pos (the weightMIS patch pattern, main.cc:1110-1186)."""
    wi = normalize(wi_pos - v["pos"])
    wo_vec = wo_pos - v["pos"]
    dist = jnp.linalg.norm(wo_vec, axis=-1)
    wo = wo_vec / jnp.maximum(dist[:, None], 1e-30)
    pdf_o = _pdf_brdf(_mat(scene, v["fid"]), wi, wo, v["orig_norm"], v["norm"])
    return pdf_o * jnp.abs(_dot(v["norm"], wo)) / jnp.maximum(dist * dist, 1e-30)


def _weight_mis(scene, E, L, e: int, l: int, total_area: float):
    """weightMIS for static strategy (e, l) (main.cc:1081-1209)."""
    R = E["pos"].shape[0]
    if e <= 2 and l == 0:
        return jnp.ones((R,), jnp.float32)

    length = e + l
    fwd = [None] * length
    rev = [None] * length
    for i in range(e):
        fwd[i] = E["pdf_fwd"][:, i]
        rev[i] = E["pdf_rev"][:, i]
    for i in range(l - 1, -1, -1):
        fwd[e + (l - i - 1)] = L["pdf_fwd"][:, i]
        rev[e + (l - i - 1)] = L["pdf_rev"][:, i]

    ve = _slot(E, e - 1)
    vl = _slot(L, l - 1) if l >= 1 else None
    ve_m = _slot(E, e - 2) if e >= 2 else None
    vl_m = _slot(L, l - 2) if l >= 2 else None

    # patch rev[e-1] (main.cc:1106-1128)
    if l == 0:
        rev[e - 1] = jnp.full((R,), 1.0 / total_area, jnp.float32)
    elif l == 1:
        to = ve["pos"] - vl["pos"]
        dist = jnp.linalg.norm(to, axis=-1)
        to_n = to / jnp.maximum(dist[:, None], 1e-30)
        dot = _dot(vl["norm"], to_n)
        pdf_dir = jnp.maximum(0.0, dot)
        rev[e - 1] = pdf_dir * dot / jnp.maximum(dist * dist, 1e-30)
    else:
        rev[e - 1] = _vert_pdf(scene, vl, vl_m["pos"], ve["pos"])

    # patch rev[e] (main.cc:1130-1145)
    if l >= 1:
        rev[e] = _vert_pdf(scene, ve, ve_m["pos"], vl["pos"])

    # patch rev[e-2] (main.cc:1147-1168)
    if e >= 2:
        if l == 0:
            to = ve_m["pos"] - ve["pos"]
            dist = jnp.linalg.norm(to, axis=-1)
            to_n = to / jnp.maximum(dist[:, None], 1e-30)
            dot = _dot(ve["norm"], to_n)
            rev[e - 2] = jnp.maximum(0.0, dot) * dot / jnp.maximum(
                dist * dist, 1e-30
            )
        else:
            rev[e - 2] = _vert_pdf(scene, ve, vl["pos"], ve_m["pos"])

    # patch rev[e+1] (main.cc:1170-1186)
    if l >= 2:
        rev[e + 1] = _vert_pdf(scene, vl, ve["pos"], vl_m["pos"])

    e_delta = [
        _vert_delta(scene, _slot(E, i)) for i in range(e)
    ]
    l_delta = [
        _vert_delta(scene, _slot(L, i)) for i in range(l)
    ]

    mis = jnp.zeros((R,), jnp.float32)
    prob = jnp.ones((R,), jnp.float32)
    for i in range(e - 1, 1, -1):
        pf = jnp.where(fwd[i] == 0.0, 1.0, fwd[i])
        pr = jnp.where(rev[i] == 0.0, 1.0, rev[i])
        prob = prob * pr / pf
        skip = e_delta[i] | e_delta[i - 1]
        mis = mis + jnp.where(skip, 0.0, prob * prob)
    prob = jnp.ones((R,), jnp.float32)
    for i in range(e, length):
        pf = jnp.where(fwd[i] == 0.0, 1.0, fwd[i])
        pr = jnp.where(rev[i] == 0.0, 1.0, rev[i])
        prob = prob * pr / pf
        skip = l_delta[length - i - 1]
        if i + 1 < length:
            skip = skip | l_delta[length - i - 2]
        mis = mis + jnp.where(skip, 0.0, prob * prob)
    return 1.0 / (1.0 + mis)


def _calc_g(scene, v1, v2, tile):
    """calcG (main.cc:1211-1243): visibility requires the connection ray
    to hit a surface within kEps of the target distance."""
    to = v2["pos"] - v1["pos"]
    dist = jnp.linalg.norm(to, axis=-1)
    to_n = to / jnp.maximum(dist[:, None], 1e-30)
    R = dist.shape[0]
    hits = _trace(
        scene, v1["pos"], to_n,
        jnp.full((R,), K_EPS, jnp.float32), jnp.full((R,), K_INF, jnp.float32),
        tile,
    )
    visible = hits.hit & (jnp.abs(dist - hits.t) <= K_EPS)
    d1 = jnp.maximum(0.0, _dot(to_n, v1["norm"]))
    d2 = jnp.maximum(0.0, _dot(-to_n, v2["norm"]))
    g = d1 * d2 / jnp.maximum(dist * dist, 1e-30)
    return jnp.where(visible, g, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("eye_bounces", "light_bounces", "max_bounces", "tile",
                     "total_area", "has_normals"),
)
def trace_bdpt(
    scene: PTScene,
    cam_org: jnp.ndarray,
    cam_dir: jnp.ndarray,
    light_cdf: jnp.ndarray,
    key,
    total_area: float,
    eye_bounces: int = 5,
    light_bounces: int = 4,
    max_bounces: int = 10,
    tile: int = 8192,
    has_normals: bool = False,
):
    """One BDPT sample per camera ray; returns linear RGB (R, 3)."""
    R = cam_org.shape[0]
    one3 = jnp.ones((R, 3), jnp.float32)

    # ---- eye subpath (eyeSubpath, main.cc:1015-1043) ----
    eye_root = dict(
        pos=cam_org,
        norm=cam_dir,  # the lens vertex stores the ray dir as its normal
        orig_norm=cam_dir,
        wo=-cam_dir,
        beta=one3,
        pdf_fwd=jnp.ones((R,), jnp.float32),
        is_light=jnp.zeros((R,), bool),
    )
    eye_walk = _walk(
        scene, cam_org, cam_dir, one3, jnp.ones((R,), jnp.float32),
        cam_org, cam_dir, True, jax.random.fold_in(key, 1),
        eye_bounces, tile, has_normals,
    )
    E = _assemble(eye_root, eye_walk, eye_bounces + 1)

    # ---- light subpath (lightSubpath, main.cc:1045-1080) ----
    lk = jax.random.fold_in(key, 2)
    lpos, lnorm, le, pdf_pos = _sample_light_vertex(
        scene, light_cdf, total_area, lk, R
    )
    l_beta0 = le / pdf_pos
    ldir, pdf_dir = _cos_dir(jax.random.fold_in(lk, 3), lnorm)
    light_root = dict(
        pos=lpos,
        norm=lnorm,
        orig_norm=lnorm,
        wo=lnorm,
        beta=l_beta0,
        pdf_fwd=jnp.full((R,), pdf_pos, jnp.float32),
        is_light=jnp.ones((R,), bool),
    )
    light_walk = _walk(
        scene, lpos, ldir, l_beta0, pdf_dir, lpos, lnorm, False,
        jax.random.fold_in(key, 4), light_bounces, tile, has_normals,
    )
    L = _assemble(light_root, light_walk, light_bounces + 1)

    color = jnp.zeros((R, 3), jnp.float32)

    # ---- l = 0: the eye path hit the light (connectPath, main.cc:1250) ----
    for k in range(1, eye_bounces + 1):
        ev = _slot(E, k)
        mask = E["valid"][:, k] & E["is_light"][:, k]
        mis = _weight_mis(scene, E, L, k + 1, 0, total_area)
        color = color + jnp.where(mask[:, None], mis[:, None] * ev["beta"], 0.0)

    # ---- general connections (main.cc:1257-1285) ----
    for e in range(2, eye_bounces + 2):
        ev = _slot(E, e - 1)
        ev_ok = (
            E["valid"][:, e - 1]
            & ~E["is_light"][:, e - 1]
            & ~_vert_delta(scene, ev)
        )
        for l in range(1, light_bounces + 2):
            if e + l - 2 > max_bounces:
                continue
            lv = _slot(L, l - 1)
            lv_ok = L["valid"][:, l - 1]
            if l != 1:
                lv_ok = lv_ok & ~_vert_delta(scene, lv)
            active = ev_ok & lv_ok
            if l == 1:
                to = lv["pos"] - ev["pos"]
                dist = jnp.linalg.norm(to, axis=-1)
                to_n = to / jnp.maximum(dist[:, None], 1e-30)
                contrib = (
                    ev["beta"] * _vert_f(scene, ev, lv["pos"]) * lv["beta"]
                    * jnp.abs(_dot(lv["norm"], -to_n))[:, None]
                )
            else:
                contrib = (
                    ev["beta"] * _vert_f(scene, ev, lv["pos"])
                    * _vert_f(scene, lv, ev["pos"]) * lv["beta"]
                )
            nonzero = (contrib != 0).any(-1) & active
            g = _calc_g(scene, ev, lv, tile)
            mis = _weight_mis(scene, E, L, e, l, total_area)
            color = color + jnp.where(
                nonzero[:, None], contrib * g[:, None] * mis[:, None], 0.0
            )

    return color


def render_bdpt(scene: PTScene, cam_rays: Rays, key, spp: int = 4,
                eye_bounces: int = 5, light_bounces: int = 4,
                tile: int = 8192):
    """Accumulate spp BDPT samples per camera ray (main.cc:1378-1398)."""
    cdf, total = _light_sampler_arrays(scene)
    bs = cam_rays.batch_shape
    org = cam_rays.org.reshape(-1, 3)
    d = cam_rays.dir.reshape(-1, 3)
    acc = jnp.zeros((org.shape[0], 3), jnp.float32)
    for s in range(spp):
        acc = acc + trace_bdpt(
            scene, org, d, cdf, jax.random.fold_in(key, s), total,
            eye_bounces=eye_bounces, light_bounces=light_bounces, tile=tile,
            has_normals=scene.facevarying_normals is not None,
        )
    return (acc / spp).reshape(*bs, 3)
