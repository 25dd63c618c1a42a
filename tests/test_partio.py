"""Particle IO (partio equivalent): PDA/PDB roundtrips + sphere render
(the reference's partio_view flow, examples/partio_view/)."""

import numpy as np
import pytest

from nanort_tpu.io.partio import (
    ParticleCloud,
    load_particles,
    load_pda,
    load_pdb,
    save_pda,
    save_pdb,
    to_spheres,
)


def _cloud(n=50, seed=0):
    rng = np.random.default_rng(seed)
    return ParticleCloud(
        positions=rng.normal(size=(n, 3)).astype(np.float32),
        attributes={
            "radius": rng.uniform(0.05, 0.2, n).astype(np.float32),
            "id": np.arange(n, dtype=np.int32),
            "velocity": rng.normal(size=(n, 3)).astype(np.float32),
        },
    )


@pytest.mark.parametrize("fmt", ["pda", "pdb"])
def test_roundtrip(tmp_path, fmt):
    cloud = _cloud()
    path = str(tmp_path / f"p.{fmt}")
    (save_pda if fmt == "pda" else save_pdb)(path, cloud)
    back = (load_pda if fmt == "pda" else load_pdb)(path)
    rtol = 1e-6 if fmt == "pda" else 0
    np.testing.assert_allclose(back.positions, cloud.positions, rtol=rtol)
    np.testing.assert_allclose(
        back.attributes["radius"], cloud.attributes["radius"], rtol=rtol
    )
    np.testing.assert_array_equal(
        back.attributes["id"], cloud.attributes["id"]
    )
    np.testing.assert_allclose(
        back.attributes["velocity"], cloud.attributes["velocity"], rtol=rtol
    )
    # sniffing loader picks the right parser
    sniffed = load_particles(path)
    assert sniffed.count == cloud.count


def test_bad_files(tmp_path):
    p = tmp_path / "bad.pda"
    p.write_text("NOT A PDA\n")
    with pytest.raises(ValueError):
        load_pda(str(p))
    p2 = tmp_path / "bad.pdb"
    p2.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        load_pdb(str(p2))


def test_particles_render_as_spheres(tmp_path):
    from nanort_tpu import make_rays
    from nanort_tpu.ops.sphere import build_sphere_bvh, traverse_spheres

    cloud = ParticleCloud(
        positions=np.array(
            [[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32
        ),
        attributes={"radius": np.array([0.5, 0.25, 0.25], np.float32)},
    )
    path = str(tmp_path / "tri.pdb")
    save_pdb(path, cloud)
    spheres = to_spheres(load_particles(path))
    bvh, _ = build_sphere_bvh(spheres)
    rays = make_rays(
        np.array([[0, 0, 5], [2, 0, 5], [1, 1, 5]], np.float32),
        np.tile([0, 0, -1.0], (3, 1)).astype(np.float32),
    )
    h = traverse_spheres(bvh, spheres, rays)
    hits = np.asarray(h.hit)
    assert hits[0] and hits[1] and not hits[2]
    np.testing.assert_allclose(float(h.t[0]), 4.5, rtol=1e-6)
    np.testing.assert_allclose(float(h.t[1]), 4.75, rtol=1e-6)
