#!/usr/bin/env python
"""Wavefront path tracer on the Cornell box (reference examples/path_tracer).
Usage: python examples/path_tracer.py [out.png] [size] [spp]
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax

from nanort_tpu.io.procedural import make_cornell_pt_scene
from nanort_tpu.models.cameras import look_at, pinhole_rays
from nanort_tpu.models.path_tracer import make_pt_scene, render_path_traced
from nanort_tpu.utils.image import save_png


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "path_tracer.png"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    v, f, mids, mats = make_cornell_pt_scene()
    scene = make_pt_scene(v, f, mids, mats, engine="pallas")
    cam = look_at(eye=(0, 0, 2.3), center=(0, 0, 0), width=size, height=size, fov=55)
    rays = pinhole_rays(cam)
    t0 = time.perf_counter()
    img = np.asarray(render_path_traced(scene, rays, jax.random.PRNGKey(0),
                                        spp=spp, max_bounces=8))
    print(f"Render {time.perf_counter()-t0:.1f} secs ({spp} spp)")
    save_png(out, np.clip(img, 0, 1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
