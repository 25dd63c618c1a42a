#!/usr/bin/env python
"""gltfrender: load a glTF/.glb scene, commit the scene graph, render
normal-shaded AOVs (mirror of reference examples/gltfrender).
Usage: python examples/gltfrender.py scene.gltf [out.png] [size]
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np

from nanort_tpu.io.gltf import load_gltf, to_scene_graph
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.utils.image import save_png


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return
    out = sys.argv[2] if len(sys.argv) > 2 else "gltfrender.png"
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    g = load_gltf(sys.argv[1])
    print(f"{len(g.meshes)} meshes, {len(g.instances)} instances")
    sc = to_scene_graph(g)
    t0 = time.perf_counter()
    sc.commit()
    print(f"commit (builds + packing): {time.perf_counter()-t0:.2f}s")
    lo, hi = sc.bounding_box()
    center = 0.5 * (lo + hi)
    ext = float(np.linalg.norm(hi - lo))
    cam = look_at(eye=center + [0.4 * ext, 0.3 * ext, 1.1 * ext],
                  center=center, width=size, height=size, fov=45)
    t0 = time.perf_counter()
    hits = sc.traverse(pinhole_rays(cam))
    n = np.asarray(hits.normal_s)
    hit = np.asarray(hits.hit)
    img = np.where(hit[..., None], 0.5 * np.abs(n) + 0.3, 0.0)
    print(f"render: {time.perf_counter()-t0:.2f}s ({hit.mean()*100:.0f}% hit)")
    save_png(out, img, gamma=1.0)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
