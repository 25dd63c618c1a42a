"""nanort_tpu — a TPU-native ray-tracing framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
lighttransport/nanort (see SURVEY.md): linear-BVH build + traversal with
watertight triangle intersection, a duck-typed primitive protocol, a
two-level scene graph, and wavefront renderers, designed for SoA ray
megabatches on TPU rather than per-ray recursion on CPU.
"""

from .core.aabb import intersect_ray_aabb, max_mult
from .core.bvh import BVH, compute_skip_links, dump, load, validate
from .core.math import safe_inverse
from .core.options import (
    BVHBuildOptions,
    BVHBuildStatistics,
    BVHTraceOptions,
    INVALID_PRIM_ID,
)
from .core.ray import (
    Hits,
    Rays,
    RAY_TYPE_DIFFUSE,
    RAY_TYPE_NONE,
    RAY_TYPE_PRIMARY,
    RAY_TYPE_REFLECTION,
    RAY_TYPE_REFRACTION,
    RAY_TYPE_SECONDARY,
    make_rays,
    no_hits,
)
from .build.sah import build_sah
from .ops.triangle import (
    TriangleMesh,
    intersect_triangles,
    ray_coeffs,
    triangle_prim_bounds,
)
from .traverse.brute import brute_force_traverse
from .traverse.multi_hit import multi_hit_traverse
from .traverse.stack import (
    list_node_intersections,
    traverse,
    traverse_triangles,
)

__version__ = "0.1.0"


def build_triangle_bvh(
    mesh, options: BVHBuildOptions = BVHBuildOptions(), use_native: bool = True
):
    """Convenience: per-face bounds -> binned-SAH linear BVH.

    Equivalent of ``BVHAccel<float>::Build(num_faces, TriangleMesh,
    TriangleSAHPred, options)`` (nanort.h:716-718, 1892-2149). Uses the
    multithreaded C++ builder for f32 meshes when the native toolchain is
    available (like the reference's parallel C++ build), the NumPy builder
    otherwise (and always for f64, which the native path doesn't carry)."""
    import numpy as _np

    dtype = _np.asarray(mesh.vertices).dtype
    if use_native and dtype == _np.float32:
        from .build.native import (
            build_sah_native,
            native_available,
            triangle_bounds_native,
        )

        if native_available():
            bmin, bmax, centers = triangle_bounds_native(
                _np.asarray(mesh.vertices), _np.asarray(mesh.faces)
            )
            return build_sah_native(bmin, bmax, centers, options)
    bmin, bmax, centers = triangle_prim_bounds(mesh)
    return build_sah(bmin, bmax, centers, options)
