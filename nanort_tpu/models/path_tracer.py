"""Wavefront path tracer — TPU re-design of examples/path_tracer/main.cc.

The reference traces one pixel-sample at a time on a CPU thread pool
(main.cc:785-1009); here the whole (pixels x spp) sample batch advances
through the bounce loop together as SoA arrays with an alive mask — the
wavefront formulation. Per bounce: one visibility traversal + one NEE
shadow traversal, both over the full batch.

Faithful semantics (citations into the reference):
* Russian roulette after bounce 3, p_term = 0.2 (main.cc:828-837)
* ray epsilon via min_t = 0.001, no self-prim skip (main.cc:841-843)
* facevarying-normal interpolation + flip toward ray (main.cc:863-880)
* Schlick fresnel with n1/n2 from hit side (main.cc:884-896, 660-663)
* lobe probabilities rhoS/rhoD/rhoR/rhoE from luminance-averaged material
  colors, fresnel and dissolve mix, normalized; terminate when total
  < 1e-4 (main.cc:898-925)
* NEE on the diffuse lobe only: uniform emissive-face pick, sqrt-warp
  barycentric sample, cosine EDF, area->solid-angle pdf, shadow ray with
  eps endpoints (MeshLight::sampleDirect main.cc:336-397, CheckForOccluder
  main.cc:675-701); emission hits only counted when the previous event
  didn't light-sample (do_emmition flag, main.cc:824, 938, 964-971)
* cosine-hemisphere sampling via the revised ONB (main.cc:214-250)
* refract with TIR returning a zero vector (main.cc:649-656) — the zero
  ray then misses, matching the reference's behavior
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ray import Rays
from ..ops.triangle import TriangleMesh
from ..traverse.packed import PackedScene
from ..traverse.wavefront import traverse_wavefront


class Materials(NamedTuple):
    """Per-material arrays (tinyobj material_t fields the shader reads)."""

    diffuse: jnp.ndarray  # (M, 3)
    emission: jnp.ndarray  # (M, 3)
    specular: jnp.ndarray  # (M, 3)
    transmittance: jnp.ndarray  # (M, 3)
    ior: jnp.ndarray  # (M,)
    dissolve: jnp.ndarray  # (M,)


class PTScene(NamedTuple):
    mesh: TriangleMesh
    packed: PackedScene
    materials: Materials
    material_ids: jnp.ndarray  # (F,)
    facevarying_normals: jnp.ndarray | None  # (F, 3, 3)
    light_faces: jnp.ndarray  # (L,) emissive face ids (host precomputed)
    # optional BVH8 tables: when present, bounce traversals run through
    # the Pallas packet kernel with Morton ray sorting (TPU fast path;
    # the wavefront XLA engine is the portable default)
    scene8: object | None = None
    # per-face shading table (F, 17|26): [gnormal 3 | diffuse 3 |
    # emission 3 | specular 3 | transmittance 3 | ior | dissolve
    # (| vertex normals 9)].  One row lookup replaces ~13 per-ray
    # scalar/short gathers per bounce — the per-INDEX gather fee
    # (~110M/s on v5e) dominated the megabatch bounce loop.
    face_table: jnp.ndarray | None = None
    # per-light-face table (L, 16): [v0 3 | v1 3 | v2 3 | unit normal 3 |
    # area | emission 3] for _sample_light
    light_table: jnp.ndarray | None = None
    # per-leaf-row aux table (traverse/fused_trace.build_aux_rows):
    # geometric normal / material id / prim id per leaf slot, enabling
    # the BVH-traced fused megakernel (models/pt_fused.render_fused_bvh)
    fused_aux: jnp.ndarray | None = None


# One-hot matmul lookups stay exact (a single 1.0 per row copies table
# values bit-for-bit under Precision.HIGHEST) and cost ~R*F*C flops on
# the MXU instead of R per-index gather fees; the (R, F) one-hot operand
# caps the table height.
ONEHOT_MAX_ROWS = 64


def _rows_by_id(table, idx):
    """table[idx] as (len(idx), C). Tiny tables ride a one-hot MXU
    matmul (exact: one 1.0 per row, full-f32 precision); larger ones a
    single row gather (one per-index fee for all C columns)."""
    F = table.shape[0]
    if F <= ONEHOT_MAX_ROWS:
        oh = (idx[:, None] == jnp.arange(F, dtype=idx.dtype)[None, :])
        return jax.lax.dot(oh.astype(table.dtype), table,
                           precision=jax.lax.Precision.HIGHEST)
    return jnp.take(table, idx, axis=0)


def collect_light_faces(material_ids, materials: Materials) -> np.ndarray:
    """Emissive-face collection (MeshLight ctor, main.cc:323-334)."""
    em = np.asarray(materials.emission)
    mid = np.asarray(material_ids)
    return np.nonzero((em[mid] > 0.0).any(axis=-1))[0].astype(np.int32)


def _luma(c):
    return jnp.mean(c, axis=-1)  # vdot(1/3, c) (main.cc:899-908)


def _reflect(i, n):
    return i - 2.0 * jnp.sum(i * n, -1, keepdims=True) * n


def _refract(i, n, eta):
    ndi = jnp.sum(n * i, -1, keepdims=True)
    k = 1.0 - eta[..., None] ** 2 * (1.0 - ndi**2)
    out = eta[..., None] * i - (eta[..., None] * ndi + jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k < 0.0, jnp.zeros_like(out), out)


def _fresnel_schlick(h, n, r):
    r0 = r * r
    c = 1.0 - jnp.sum(h * n, -1)
    return r0 + (1.0 - r0) * c * c * c * c * c


def _revised_onb(n):
    """Revised ONB, both sign branches via select (main.cc:216-229)."""
    z = n[..., 2]
    a_neg = 1.0 / (1.0 - z)
    a_pos = 1.0 / (1.0 + z)
    x, y = n[..., 0], n[..., 1]
    b_neg = x * y * a_neg
    b_pos = -x * y * a_pos
    b1 = jnp.where(
        z[..., None] < 0.0,
        jnp.stack([1.0 - x * x * a_neg, -b_neg, x], -1),
        jnp.stack([1.0 - x * x * a_pos, b_pos, -x], -1),
    )
    b2 = jnp.where(
        z[..., None] < 0.0,
        jnp.stack([b_neg, y * y * a_neg - 1.0, -y], -1),
        jnp.stack([b_pos, 1.0 - y * y * a_pos, -y], -1),
    )
    return b1, b2


def _cosine_dir(key, n, u2=None):
    """Cosine-hemisphere direction about n. ``u2``: optional pre-drawn
    (..., 2) uniforms (the bounce loop batches all its draws into one
    threefry dispatch)."""
    if u2 is not None:
        u1, phi = u2[..., 0], u2[..., 1] * (2.0 * jnp.pi)
    else:
        u1 = jax.random.uniform(key, n.shape[:-1], jnp.float32)
        phi = jax.random.uniform(
            jax.random.fold_in(key, 1), n.shape[:-1], jnp.float32
        ) * (2.0 * jnp.pi)
    r = jnp.sqrt(u1)
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(1.0 - u1)
    b1, b2 = _revised_onb(n)
    return b1 * x[..., None] + b2 * y[..., None] + n * z[..., None]


def _sample_light(scene: PTScene, key, x, u2=None):
    """MeshLight::sampleDirect (main.cc:336-397). Returns (dir, dist, pdf,
    radiance)."""
    lf = scene.light_faces
    nl = lf.shape[0]
    if nl == 0:
        # no emissive faces: NEE disabled via pdf = 0 everywhere
        z3 = jnp.zeros(x.shape, jnp.float32)
        z1 = jnp.zeros(x.shape[:-1], jnp.float32)
        return z3, z1, z1, z3
    if u2 is not None:
        xi1, xi2 = u2[..., 0], u2[..., 1]
    else:
        xi1 = jax.random.uniform(key, x.shape[:-1], jnp.float32)
        xi2 = jax.random.uniform(
            jax.random.fold_in(key, 1), x.shape[:-1], jnp.float32)
    fidx = jnp.minimum((xi1 * nl).astype(jnp.int32), nl - 1)
    xi1 = xi1 * nl - fidx
    pick_pdf = 1.0 / nl

    if scene.light_table is not None and fidx.ndim == 1:
        # one row lookup (PTScene.light_table layout), values
        # precomputed with identical f32 ops
        rows = _rows_by_id(scene.light_table, fidx)
        v0, v1, v2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
        norm = rows[:, 9:12]
        area = rows[:, 12]
        ll = rows[:, 13:16]
    else:
        fid = jnp.take(lf, fidx)
        f = jnp.take(scene.mesh.faces, fid, axis=0)
        tri = jnp.take(scene.mesh.vertices, f, axis=0)
        v0, v1, v2 = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
        cr = jnp.cross(v1 - v0, v2 - v0)
        area = 0.5 * jnp.linalg.norm(cr, axis=-1)
        norm = cr / jnp.maximum(
            jnp.linalg.norm(cr, axis=-1, keepdims=True), 1e-30)
        mid = jnp.take(scene.material_ids, fid)
        ll = jnp.take(scene.materials.emission, mid, axis=0)

    s = jnp.sqrt(xi1)
    c0 = (1.0 - s)[..., None]
    c1 = (s * (1.0 - xi2))[..., None]
    c2 = (s * xi2)[..., None]
    lp = c0 * v0 + c1 * v1 + c2 * v2

    d = lp - x
    dist = jnp.linalg.norm(d, axis=-1)
    ok = dist > 1e-6
    dirn = d / jnp.maximum(dist[..., None], 1e-30)
    cos_l = jnp.maximum(jnp.sum(-dirn * norm, -1), 0.0)
    radiance = ll * cos_l[..., None]
    # PdfAtoW: area pdf * dist^2 / cos (main.cc:300-310)
    area_pdf = pick_pdf / jnp.maximum(area, 1e-30)
    pdf = jnp.where(
        ok & (cos_l > 1e-12), area_pdf * dist * dist / jnp.maximum(cos_l, 1e-30), 0.0
    )
    return dirn, dist, pdf, radiance


# Scenes at or below this many triangles trace brute-force: one fused
# watertight sweep over all prims beats any accelerated path because it
# has ZERO permutation cost (sort+unsort of a 6.5M-ray megabatch costs
# ~1s while 32-tri Cornell leaf work is ~10ms). The reference's own
# path_tracer benchmark scene is 32 triangles (path_tracer/main.cc:31-33).
BRUTE_MAX_TRIS = 512


def _trace(scene: PTScene, org, d, min_t, max_t, tile, occlusion=False):
    rays = Rays(org=org, dir=d, min_t=min_t, max_t=max_t)
    if scene.mesh.num_faces <= BRUTE_MAX_TRIS:
        from ..traverse.brute import brute_force_traverse

        # bound the (R, chunk) intersection intermediates to ~64M
        # elements: XLA holds several of them live inside the bounce
        # while-loop, and megabatch R is in the millions
        R = org.reshape(-1, 3).shape[0]
        chunk = int(min(512, max(4, (1 << 26) // max(R, 1))))
        return brute_force_traverse(scene.mesh, rays, chunk_size=chunk)
    if scene.scene8 is not None:
        from ..traverse.ray_sort import traverse_bvh8_sorted

        # engine="turbo" scenes carry the Woop table: Monte Carlo
        # rendering tolerates its ulp-level deviations by construction
        woop = getattr(scene.scene8, "leafs_woop", None) is not None
        return traverse_bvh8_sorted(
            scene.scene8, rays, occlusion=occlusion,
            intersector="woop" if woop else "watertight",
        )
    return traverse_wavefront(scene.packed, rays, tile=tile)


@functools.partial(
    jax.jit, static_argnames=("max_bounces", "rr_start", "tile", "has_normals")
)
def trace_paths(
    scene: PTScene,
    org0: jnp.ndarray,
    dir0: jnp.ndarray,
    key,
    max_bounces: int = 10,
    rr_start: int = 3,
    tile: int = 8192,
    has_normals: bool = True,
):
    """Trace one sample per input ray; returns linear-RGB radiance (R, 3)."""
    R = org0.shape[0]
    f32 = jnp.float32
    kfar = f32(1.0e30)
    eps_t = f32(0.001)
    ray_eps = f32(0.00001)

    state = dict(
        org=org0.astype(f32),
        dir=dir0.astype(f32),
        color=jnp.zeros((R, 3), f32),
        weight=jnp.ones((R, 3), f32),
        alive=jnp.ones((R,), bool),
        do_emission=jnp.ones((R,), bool),
    )

    def bounce(b, st):
        k = jax.random.fold_in(key, b)
        alive = st["alive"]
        # ALL of this bounce's uniforms in one threefry dispatch
        # (columns: rr, lobe pick, light xi1/xi2, cosine u1/phi)
        U = jax.random.uniform(jax.random.fold_in(k, 9), (R, 6), jnp.float32)

        # Russian roulette (main.cc:828-838)
        rr_apply = b > rr_start
        rr_rand = U[:, 0]
        killed = rr_apply & (rr_rand < 0.2)
        alive = alive & ~killed
        rr_fac = jnp.where(rr_apply, 1.0 / (1.0 - 0.2), 1.0)
        weight = st["weight"] * rr_fac

        hits = _trace(
            scene,
            st["org"],
            st["dir"],
            jnp.full((R,), eps_t, f32),
            jnp.where(alive, kfar, f32(0.0)),  # dead rays trace nothing
            tile,
        )
        hit = hits.hit & alive
        fid = jnp.where(hit, hits.prim_id, 0).astype(jnp.int32)

        p = st["org"] + st["dir"] * hits.t[..., None]

        if scene.face_table is not None:
            # ONE per-ray row lookup for everything the shader reads
            # (PTScene.face_table layout); values were precomputed with
            # the same f32 ops, so records match the gather path exactly
            rows = _rows_by_id(scene.face_table, fid)
            if has_normals and scene.facevarying_normals is not None:
                nrm3 = rows[:, 17:26].reshape(-1, 3, 3)
                w0 = (1.0 - hits.u - hits.v)[..., None]
                norm = (
                    w0 * nrm3[:, 0] + hits.u[..., None] * nrm3[:, 1]
                    + hits.v[..., None] * nrm3[:, 2]
                )
                norm = norm / jnp.maximum(
                    jnp.linalg.norm(norm, axis=-1, keepdims=True), 1e-30
                )
            else:
                norm = rows[:, 0:3]
            mat_d = rows[:, 3:6]
            mat_e = rows[:, 6:9]
            mat_s = rows[:, 9:12]
            mat_r = rows[:, 12:15]
            ior = rows[:, 15]
            dissolve = rows[:, 16]
        else:
            if has_normals and scene.facevarying_normals is not None:
                nrm3 = jnp.take(scene.facevarying_normals, fid, axis=0)
                w0 = (1.0 - hits.u - hits.v)[..., None]
                norm = (
                    w0 * nrm3[:, 0] + hits.u[..., None] * nrm3[:, 1]
                    + hits.v[..., None] * nrm3[:, 2]
                )
                norm = norm / jnp.maximum(
                    jnp.linalg.norm(norm, axis=-1, keepdims=True), 1e-30
                )
            else:
                f = jnp.take(scene.mesh.faces, fid, axis=0)
                tri = jnp.take(scene.mesh.vertices, f, axis=0)
                norm = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
                norm = norm / jnp.maximum(
                    jnp.linalg.norm(norm, axis=-1, keepdims=True), 1e-30
                )

            mid = jnp.take(scene.material_ids, fid)
            mat_d = jnp.take(scene.materials.diffuse, mid, axis=0)
            mat_e = jnp.take(scene.materials.emission, mid, axis=0)
            mat_s = jnp.take(scene.materials.specular, mid, axis=0)
            mat_r = jnp.take(scene.materials.transmittance, mid, axis=0)
            ior = jnp.take(scene.materials.ior, mid)
            dissolve = jnp.take(scene.materials.dissolve, mid)

        original_norm = norm
        facing = jnp.sum(norm * st["dir"], -1) > 0
        norm = jnp.where(facing[..., None], -norm, norm)

        inside = jnp.where(jnp.sum(st["dir"] * original_norm, -1) < 0, -1.0, 1.0)
        n1 = jnp.where(inside < 0, 1.0 / ior, ior)
        n2 = 1.0 / n1
        fres = _fresnel_schlick(-st["dir"], norm, (n1 - n2) / (n1 + n2))

        rho_s = _luma(mat_s) * fres
        rho_d = _luma(mat_d) * (1.0 - fres) * (1.0 - dissolve)
        rho_r = _luma(mat_r) * (1.0 - fres) * dissolve
        rho_e = _luma(mat_e)
        total = rho_s + rho_d + rho_r + rho_e
        absorbed = total < 1e-4
        tot = jnp.where(absorbed, 1.0, total)
        rho_s, rho_d, rho_r, rho_e = (
            rho_s / tot, rho_d / tot, rho_r / tot, rho_e / tot,
        )

        rand = U[:, 1]
        pick_s = rand < rho_s
        pick_d = ~pick_s & (rand < rho_s + rho_d)
        pick_r = ~pick_s & ~pick_d & (rand < rho_s + rho_d + rho_r)
        pick_e = ~pick_s & ~pick_d & ~pick_r

        # --- NEE on the diffuse lobe (main.cc:938-957) ---
        ldir, ldist, lpdf, lrad = _sample_light(
            scene, jax.random.fold_in(k, 12), p, u2=U[:, 2:4])
        shadow_max = jnp.maximum(ldist - ray_eps, 0.0)
        nee_active = hit & pick_d & (lpdf > 0.0) & ~absorbed
        sh = _trace(
            scene,
            p,
            ldir,
            jnp.full((R,), ray_eps, f32),
            jnp.where(nee_active, shadow_max, f32(0.0)),
            tile,
            occlusion=True,
        )
        visible = ~sh.hit
        cos_t = jnp.abs(jnp.sum(ldir * norm, -1))
        brdf = mat_d / jnp.pi
        direct = brdf * lrad * (cos_t / jnp.maximum(lpdf, 1e-30))[..., None]
        color = st["color"] + jnp.where(
            (nee_active & visible)[..., None], direct * weight, 0.0
        )

        # --- emission (main.cc:964-971) ---
        emit_gate = hit & pick_e & st["do_emission"] & ~absorbed
        cos_e = jnp.maximum(jnp.sum(original_norm * -st["dir"], -1), 0.0)
        color = color + jnp.where(
            emit_gate[..., None], cos_e[..., None] * mat_e * weight, 0.0
        )

        # --- next direction & weight ---
        out_s = _reflect(st["dir"], norm)
        out_d = _cosine_dir(jax.random.fold_in(k, 13), norm, u2=U[:, 4:6])
        out_r = _refract(st["dir"], -inside[..., None] * original_norm, n1)
        new_dir = jnp.where(
            pick_s[..., None], out_s,
            jnp.where(pick_d[..., None], out_d, out_r),
        )
        lobe_w = jnp.where(
            pick_s[..., None], mat_s,
            jnp.where(pick_d[..., None], mat_d, mat_r),
        )
        weight = weight * jnp.where(hit[..., None], lobe_w, 1.0)

        alive = hit & ~pick_e & ~absorbed
        do_em = jnp.where(pick_d, False, True)

        return dict(
            org=jnp.where(hit[..., None], p, st["org"]),
            dir=jnp.where(hit[..., None], new_dir, st["dir"]),
            color=color,
            weight=weight,
            alive=alive,
            do_emission=jnp.where(hit, do_em, st["do_emission"]),
        )

    st = jax.lax.fori_loop(0, max_bounces, bounce, state)
    return st["color"]


def _auto_spp_batch(spp: int, n_rays: int, cap_rays: int = 8_388_608):
    """Largest divisor of spp whose megabatch stays under ~8M rays (one
    compile, equal chunk shapes)."""
    best = 1
    for k in range(1, spp + 1):
        if spp % k == 0 and k * n_rays <= cap_rays:
            best = k
    return best


def _fused_bvh_spp_chunk(scene, spp: int, n_rays: int,
                         max_bounces: int) -> int:
    """Largest divisor of spp whose single fused-BVH launch stays well
    under the axon worker's ~2-minute launch kill.

    The budget is in faces x spp units at the 512^2 x mb=10 reference
    point, scaled by pixels and bounces. Calibration
    (tools/experiments/pt_fused_scale.md): 100K faces x 25 spp ran
    31.5 s green and x100 spp (~126 s) was killed; 3.2M units targets
    ~40 s/launch with that measured constant. The 974-face config-B
    protocol scene lands at 97K units for the full 100 spp, so it stays
    a single launch (bit-identical to the unchunked path)."""
    F = max(int(scene.mesh.num_faces), 1)
    units = 3_200_000 * (262_144 / max(n_rays, 1)) * (
        10.0 / max(max_bounces, 1))
    max_chunk = max(1, int(units // F))
    if spp <= max_chunk:
        return spp
    return max(d for d in range(1, max_chunk + 1) if spp % d == 0)


def render_path_traced(
    scene: PTScene,
    cam_rays: Rays,
    key,
    spp: int = 8,
    max_bounces: int = 10,
    tile: int = 8192,
    spp_batch: int | None = None,
    fused: bool | None = None,
    azimuth_strata: int | None = None,
    spp_lanes: int | None = None,
):
    """Accumulate spp samples per camera ray; returns linear RGB with the
    camera-ray batch shape + (3,). (The reference's SPP loop,
    main.cc:806-980; gamma is applied at save time like main.cc:985-987.)

    Samples advance through the bounce loop in megabatches of
    ``spp_batch`` samples x all pixels (default: the largest divisor of
    spp that keeps the batch under ~8M rays). One-sample bounce batches
    are sort/launch-overhead bound on TPU — batching 16-25 spp together
    amortizes the per-bounce ray sort and kernel dispatch AND makes the
    sorted packets denser (more rays per spatial cell).

    ``fused``: route the whole render through the single-Pallas-kernel
    path (models/pt_fused.py — spp x bounce loops entirely on-core).
    Default: auto — on for brute-force-class scenes when running on TPU
    (where it is kernel-class faster), off elsewhere. The fused kernel
    uses its own counter-based RNG stream, so images agree with the
    megabatch path statistically, not sample-for-sample.

    ``azimuth_strata`` (fused paths only): each (sample, bounce) draws
    its diffuse azimuth inside one shared 1/N wedge that cycles with
    the sample index — per-pixel marginals stay uniform (stratified,
    unbiased; cross-pixel noise becomes correlated), and fused-kernel
    bounce blocks gain direction coherence (config B 2.23 -> 1.92 s,
    exp_r4_ptb2). N must DIVIDE spp or the wedge coverage is uneven
    (a small azimuth bias); the default picks the first divisor of
    spp in {4, 8, 5, 3, 2, 1} — 4 wedges measured best on config B
    (az4 1.92 s vs az8 1.97 s vs az1 2.23 s, exp_r4_ptb2). Pass 1 to
    disable.

    Compile caching: the fused kernels trace seed/spp/max_bounces
    through an SMEM meta row (one compiled kernel covers every value),
    BUT ``azimuth_strata`` is a static compile key and its default is
    derived from spp — so a warmup call at a different spp can pick a
    different strata count and compile a SECOND kernel (an spp=1
    warmup before an spp=100 run cost the r4 matrix 4.5 s of
    recompile). Warm up at the production spp, or pin
    ``azimuth_strata`` explicitly across calls."""
    if azimuth_strata is None:
        azimuth_strata = next(
            n for n in (4, 8, 5, 3, 2, 1) if spp % n == 0)
    bs = cam_rays.batch_shape
    org = cam_rays.org.reshape(-1, 3)
    d = cam_rays.dir.reshape(-1, 3)
    R = org.shape[0]
    if fused is None:
        from .pt_fused import fused_bvh_eligible, fused_eligible

        fused = (
            (fused_eligible(scene) or fused_bvh_eligible(scene))
            and jax.default_backend() == "tpu"
        )
    if fused:
        from .pt_fused import fused_eligible, render_fused, render_fused_bvh

        if fused_eligible(scene):
            img = render_fused(scene, org, d, key, spp,
                               max_bounces=max_bounces,
                               azimuth_strata=azimuth_strata)
        elif _fused_bvh_spp_chunk(scene, spp, R, max_bounces) < spp:
            # WATCHDOG CHUNKING: the axon worker kills kernel launches
            # running much past ~2 min, and one fused launch's runtime
            # scales with faces x spp x pixels x bounces
            # (tools/experiments/pt_fused_scale.md: 974 faces x 100 spp
            # = 1.87 s green; 100K x 100 = ~126 s DEAD; 100K x 25 =
            # 31.5 s green). Split spp into equal chunks that each stay
            # well under the kill, average the chunk images (equal-size
            # chunks with independent fold_in keys: same estimator).
            # Each recursive call re-derives azimuth_strata/spp_lanes
            # for ITS spp, so the wedge cycle stays unbiased per chunk;
            # all chunks share one compiled kernel.
            chunk = _fused_bvh_spp_chunk(scene, spp, R, max_bounces)
            acc = None
            for i in range(spp // chunk):
                img_i = render_path_traced(
                    scene, cam_rays, jax.random.fold_in(key, 7700 + i),
                    spp=chunk, max_bounces=max_bounces, tile=tile,
                    fused=True)
                acc = img_i if acc is None else acc + img_i
            return acc / (spp // chunk)
        else:
            # BVH-traced fused kernel: blocks share one traversal stack,
            # so image-order rays (1024-pixel-wide strips per block) pay
            # a wider footprint union than square-ish pixel tiles.
            # 32x128 tiles at sub=32 measured 2.50 s vs 3.09 s row-major
            # on config B / cornellbox_suzanne (exp_r4_ptbvh).
            sub_b = 32
            perm = None
            if len(bs) == 2 and bs[0] % sub_b == 0 and bs[1] % 128 == 0:
                H, W = bs
                idx = np.arange(H * W).reshape(
                    H // sub_b, sub_b, W // 128, 128
                ).transpose(0, 2, 1, 3).reshape(-1)
                perm = jnp.asarray(idx)
                org, d = org[perm], d[perm]
            if spp_lanes is None:
                # sample-major packing (see render_fused_bvh): largest
                # K that divides spp AND keeps the per-iteration wedge
                # cycle covering all strata ((spp//K) % az == 0)
                spp_lanes = next(
                    (k for k in (25, 20, 16, 10, 8, 5, 4, 2) if
                     spp % k == 0
                     and (spp // k) % azimuth_strata == 0), 1)
            img = render_fused_bvh(scene, org, d, key, spp,
                                   max_bounces=max_bounces, sub=sub_b,
                                   azimuth_strata=azimuth_strata,
                                   spp_lanes=spp_lanes)
            if perm is not None:
                img = jnp.zeros_like(img).at[perm].set(img)
        return img.reshape(*bs, 3)
    if spp_batch is None:
        spp_batch = _auto_spp_batch(spp, R)
    acc = jnp.zeros((R, 3), jnp.float32)
    s = 0
    while s < spp:
        n = min(spp_batch, spp - s)
        org_all = jnp.broadcast_to(org[None], (n, R, 3)).reshape(-1, 3)
        dir_all = jnp.broadcast_to(d[None], (n, R, 3)).reshape(-1, 3)
        col = trace_paths(
            scene, org_all, dir_all, jax.random.fold_in(key, s),
            max_bounces=max_bounces, tile=tile,
            has_normals=scene.facevarying_normals is not None,
        )
        acc = acc + col.reshape(n, R, 3).sum(axis=0)
        s += n
    img = acc / spp
    return img.reshape(*bs, 3)


def make_pt_scene(
    vertices, faces, material_ids, materials: dict, facevarying_normals=None,
    engine: str = "wavefront",
) -> PTScene:
    """Assemble a PTScene from host arrays (builds BVH + packed tables).
    ``engine="pallas"`` additionally builds BVH8 tables so every bounce
    traversal runs through the packet kernel with ray sorting (TPU);
    ``engine="turbo"`` also attaches the Woop leaf table so those
    traversals use the ~24%-faster approximate intersector (deviations
    are ulp-level — invisible under Monte Carlo noise)."""
    import numpy as np

    from .. import build_triangle_bvh
    from ..core.options import BVHBuildOptions
    from ..traverse.packed import pack_scene

    mesh = TriangleMesh(
        vertices=jnp.asarray(vertices, jnp.float32),
        faces=jnp.asarray(faces, jnp.int32),
    )
    if mesh.num_faces <= BRUTE_MAX_TRIS:
        # _trace ignores the BVH below this size (brute-force sweep);
        # don't pay the accelerated-table build either
        engine = "wavefront"
    if engine in ("pallas", "turbo"):
        leaf = 9 if engine == "turbo" else 8
        bvh, _ = build_triangle_bvh(
            mesh,
            BVHBuildOptions(
                min_leaf_primitives=leaf, max_leaf_primitives=leaf
            ),
        )
    else:
        bvh, _ = build_triangle_bvh(mesh)
    packed = pack_scene(bvh, np.asarray(vertices), np.asarray(faces))
    scene8 = None
    fused_aux = None
    if engine in ("pallas", "turbo"):
        from ..build.bvh8 import collapse_bvh8

        # width 16: dense single-row nodes — bit-exact vs width 8 for
        # the packet kernel AND the layout the fused BVH megakernel
        # walks in-kernel (traverse/fused_trace.py)
        s8 = collapse_bvh8(
            bvh, np.asarray(vertices), np.asarray(faces),
            width=16, woop=engine == "turbo",
        )
        from .pt_fused import PT_FUSED_BVH_MAX_TRIS

        if (mesh.num_faces <= PT_FUSED_BVH_MAX_TRIS
                and facevarying_normals is None):
            from ..traverse.fused_trace import build_aux_rows

            # gn is baked below into face_table col 0; recompute the
            # same jnp f32 value here so the fused BVH kernel reads
            # bit-identical normals to the brute/XLA paths
            _v0 = jnp.take(mesh.vertices, mesh.faces[:, 0], axis=0)
            _v1 = jnp.take(mesh.vertices, mesh.faces[:, 1], axis=0)
            _v2 = jnp.take(mesh.vertices, mesh.faces[:, 2], axis=0)
            _gn = jnp.cross(_v1 - _v0, _v2 - _v0)
            _gn = _gn / jnp.maximum(
                jnp.linalg.norm(_gn, axis=-1, keepdims=True), 1e-30)
            fused_aux = jnp.asarray(build_aux_rows(
                s8.leafs, material_ids, np.asarray(faces),
                np.asarray(vertices), s8.max_leaf,
                gn_unit=np.asarray(_gn, np.float32)))
        scene8 = s8._replace(
            nodes=jnp.asarray(s8.nodes),
            leafs=jnp.asarray(s8.leafs),
            leafs_woop=(
                jnp.asarray(s8.leafs_woop)
                if s8.leafs_woop is not None else None
            ),
        )
    mats = Materials(
        diffuse=jnp.asarray(materials["diffuse"], jnp.float32),
        emission=jnp.asarray(materials["emission"], jnp.float32),
        specular=jnp.asarray(materials["specular"], jnp.float32),
        transmittance=jnp.asarray(materials["transmittance"], jnp.float32),
        ior=jnp.asarray(materials["ior"], jnp.float32),
        dissolve=jnp.asarray(materials["dissolve"], jnp.float32),
    )
    lf = collect_light_faces(material_ids, mats)

    # ---- per-face shading table + per-light table (see PTScene) ----
    # Values are computed with the exact same f32 ops the bounce loop
    # used to run per ray, so records are bit-identical to the gather
    # path. Table memory is F x 17|26 f32 — capped to keep huge scenes
    # on the legacy per-field gathers.
    fvn = (jnp.asarray(facevarying_normals, jnp.float32)
           if facevarying_normals is not None else None)
    mid_np = jnp.asarray(material_ids, jnp.int32)
    face_table = light_table = None
    if mesh.num_faces <= 4_000_000:
        v0 = jnp.take(mesh.vertices, mesh.faces[:, 0], axis=0)
        v1 = jnp.take(mesh.vertices, mesh.faces[:, 1], axis=0)
        v2 = jnp.take(mesh.vertices, mesh.faces[:, 2], axis=0)
        gn = jnp.cross(v1 - v0, v2 - v0)
        gn_unit = gn / jnp.maximum(
            jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-30)
        cols = [
            gn_unit,
            jnp.take(mats.diffuse, mid_np, axis=0),
            jnp.take(mats.emission, mid_np, axis=0),
            jnp.take(mats.specular, mid_np, axis=0),
            jnp.take(mats.transmittance, mid_np, axis=0),
            jnp.take(mats.ior, mid_np)[:, None],
            jnp.take(mats.dissolve, mid_np)[:, None],
        ]
        if fvn is not None:
            cols.append(fvn.reshape(mesh.num_faces, 9))
        face_table = jnp.concatenate(cols, axis=1)

        lv0 = jnp.take(v0, lf, axis=0)
        lv1 = jnp.take(v1, lf, axis=0)
        lv2 = jnp.take(v2, lf, axis=0)
        lcr = jnp.cross(lv1 - lv0, lv2 - lv0)
        larea = 0.5 * jnp.linalg.norm(lcr, axis=-1)
        lnorm = lcr / jnp.maximum(
            jnp.linalg.norm(lcr, axis=-1, keepdims=True), 1e-30)
        lem = jnp.take(mats.emission, jnp.take(mid_np, lf), axis=0)
        light_table = jnp.concatenate(
            [lv0, lv1, lv2, lnorm, larea[:, None], lem], axis=1)

    return PTScene(
        mesh=mesh,
        packed=PackedScene(
            nodes=jnp.asarray(packed.nodes),
            soup=jnp.asarray(packed.soup),
            num_nodes=packed.num_nodes,
            num_prims=packed.num_prims,
        ),
        materials=mats,
        material_ids=jnp.asarray(material_ids, jnp.int32),
        facevarying_normals=(
            jnp.asarray(facevarying_normals, jnp.float32)
            if facevarying_normals is not None
            else None
        ),
        light_faces=jnp.asarray(lf),
        scene8=scene8,
        face_table=face_table,
        light_table=light_table,
        fused_aux=fused_aux,
    )
