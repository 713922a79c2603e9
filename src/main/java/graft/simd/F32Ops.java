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

  /**
   * Dequantize one SQ8 code stripe: {@code out[i] = mn[i] + (codes[base+i] & 0xFF) * st[i]}.
   * Lane-wise mul-then-add matches the scalar loop's two-rounding order
   * exactly (no cross-lane reduction), so SIMD and scalar dequant are
   * bit-identical — unlike the distance kernels, this one IS safe
   * anywhere the scalar form was.
   */
  void dequant(byte[] codes, int base, int n, float[] mn, float[] st, float[] out);
}
