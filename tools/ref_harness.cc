// Cross-validation harness: drives the REFERENCE nanort.h (read-only at
// /root/reference) against binary inputs produced by our Python tests, so
// hit records and serialized BVHs can be compared bit-for-bit.
//
// This is test tooling only — it #includes the reference header in place
// and contains none of its code. Build:
//   g++ -O2 -std=c++11 -DNANORT_ENABLE_SERIALIZATION \
//       -I/root/reference tools/ref_harness.cc -o /tmp/ref_harness
//
// Usage: ref_harness <in.bin> <hits_out.bin> <bvh_out.bin>
// in.bin layout (little endian):
//   u64 n_verts | f32 verts[n*3] | u64 n_faces | u32 faces[n*3]
//   u64 n_rays  | f32 org[n*3] | f32 dir[n*3] | f32 min_t[n] | f32 max_t[n]
// hits_out.bin: per ray: f32 t, f32 u, f32 v, u32 prim_id (0xFFFFFFFF miss)
// bvh_out.bin: the reference BVHAccel::Dump format

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "nanort.h"

int main(int argc, char **argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s in.bin hits.bin bvh.bin\n", argv[0]);
    return 1;
  }
  FILE *fp = fopen(argv[1], "rb");
  if (!fp) return 2;
  uint64_t nv, nf, nr;
  if (fread(&nv, 8, 1, fp) != 1) return 3;
  std::vector<float> verts(nv * 3);
  if (fread(verts.data(), 4, nv * 3, fp) != nv * 3) return 3;
  if (fread(&nf, 8, 1, fp) != 1) return 3;
  std::vector<unsigned int> faces(nf * 3);
  if (fread(faces.data(), 4, nf * 3, fp) != nf * 3) return 3;
  if (fread(&nr, 8, 1, fp) != 1) return 3;
  std::vector<float> org(nr * 3), dir(nr * 3), tmin(nr), tmax(nr);
  if (fread(org.data(), 4, nr * 3, fp) != nr * 3) return 3;
  if (fread(dir.data(), 4, nr * 3, fp) != nr * 3) return 3;
  if (fread(tmin.data(), 4, nr, fp) != nr) return 3;
  if (fread(tmax.data(), 4, nr, fp) != nr) return 3;
  fclose(fp);

  nanort::TriangleMesh<float> mesh(verts.data(), faces.data(), 12);
  nanort::TriangleSAHPred<float> pred(verts.data(), faces.data(), 12);
  nanort::BVHBuildOptions<float> opts;  // reference defaults
  nanort::BVHAccel<float> accel;
  if (!accel.Build((unsigned int)nf, mesh, pred, opts)) return 4;

  if (!accel.Dump(argv[3])) return 5;

  FILE *out = fopen(argv[2], "wb");
  if (!out) return 6;
  for (uint64_t i = 0; i < nr; i++) {
    nanort::Ray<float> ray;
    for (int k = 0; k < 3; k++) {
      ray.org[k] = org[3 * i + k];
      ray.dir[k] = dir[3 * i + k];
    }
    ray.min_t = tmin[i];
    ray.max_t = tmax[i];
    nanort::TriangleIntersector<float> isector(verts.data(), faces.data(), 12);
    nanort::TriangleIntersection<float> isect;
    bool hit = accel.Traverse(ray, isector, &isect);
    float rec[3] = {0.f, 0.f, 0.f};
    uint32_t pid = 0xFFFFFFFFu;
    if (hit) {
      rec[0] = isect.t;
      rec[1] = isect.u;
      rec[2] = isect.v;
      pid = isect.prim_id;
    }
    fwrite(rec, 4, 3, out);
    fwrite(&pid, 4, 1, out);
  }
  fclose(out);
  return 0;
}
