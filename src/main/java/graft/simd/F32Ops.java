package graft.simd;

/**
 * Float32 distance-kernel surface shared by the scalar fallback (the
 * Scala {@code KnnSearch.F32Kernels} family) and the SIMD implementation
 * ({@link VectorF32}). Serving-tier scans dispatch through this interface
 * once per slab, so the JIT sees at most two receiver classes and inlines
 * the winner. Semantics must match the scalar family: {@code l2sq} is the
 * SQUARED L2 distance, {@code cosine} returns 0 when either norm is 0.
 */
public interface F32Ops {
  float l2sq(float[] q, float[] v, int off, int n);

  float dot(float[] q, float[] v, int off, int n);

  float cosine(float[] q, float[] v, int off, int n);
}
