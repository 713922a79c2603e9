package graft.simd;

/**
 * SIMD float32 kernels over the JDK Vector API (incubator module,
 * JEP 414/417 — public JDK surface since Java 16). On an AVX-512 host the
 * preferred species is 16 float lanes, which is what turns the scalar-FMA
 * serving scan into the BLAS-class throughput the single-node baseline
 * (FAISS) gets from its own SIMD kernels.
 *
 * Deliberate constraints:
 * - Only method BODIES touch {@code jdk.incubator.vector} (fully-qualified
 *   names, no imports, no fields of vector types): scalac's joint
 *   compilation parses signatures only, so the Scala build never needs the
 *   incubator module, and loading THIS CLASS succeeds even on a JVM
 *   without {@code --add-modules} — the first method call then throws
 *   {@code NoClassDefFoundError}, which the Scala-side probe
 *   ({@code SimdSupport}) catches to select the scalar fallback.
 * - Lane-wise accumulation reassociates float addition, so results can
 *   differ from the scalar kernels in the last ulps. These kernels are
 *   therefore wired ONLY into serving-tier scans (ServingIndex /
 *   LocalServing / HNSW graphs) — never into the DuckDB-oracle-parity
 *   query paths, which keep the scalar family bit-for-bit.
 */
public final class VectorF32 implements F32Ops {

  @Override
  public float l2sq(float[] q, float[] v, int off, int n) {
    var s = jdk.incubator.vector.FloatVector.SPECIES_PREFERRED;
    int lanes = s.length();
    int upper = s.loopBound(n);
    var acc0 = jdk.incubator.vector.FloatVector.zero(s);
    var acc1 = jdk.incubator.vector.FloatVector.zero(s);
    int i = 0;
    // two independent accumulators hide the fma latency chain
    int upper2 = n - 2 * lanes;
    for (; i <= upper2; i += 2 * lanes) {
      var d0 = jdk.incubator.vector.FloatVector.fromArray(s, q, i)
          .sub(jdk.incubator.vector.FloatVector.fromArray(s, v, off + i));
      var d1 = jdk.incubator.vector.FloatVector.fromArray(s, q, i + lanes)
          .sub(jdk.incubator.vector.FloatVector.fromArray(s, v, off + i + lanes));
      acc0 = d0.fma(d0, acc0);
      acc1 = d1.fma(d1, acc1);
    }
    for (; i < upper; i += lanes) {
      var d = jdk.incubator.vector.FloatVector.fromArray(s, q, i)
          .sub(jdk.incubator.vector.FloatVector.fromArray(s, v, off + i));
      acc0 = d.fma(d, acc0);
    }
    float sum = acc0.add(acc1).reduceLanes(jdk.incubator.vector.VectorOperators.ADD);
    for (; i < n; i++) {
      float d = q[i] - v[off + i];
      sum += d * d;
    }
    return sum;
  }

  @Override
  public float dot(float[] q, float[] v, int off, int n) {
    var s = jdk.incubator.vector.FloatVector.SPECIES_PREFERRED;
    int lanes = s.length();
    int upper = s.loopBound(n);
    var acc0 = jdk.incubator.vector.FloatVector.zero(s);
    var acc1 = jdk.incubator.vector.FloatVector.zero(s);
    int i = 0;
    int upper2 = n - 2 * lanes;
    for (; i <= upper2; i += 2 * lanes) {
      acc0 = jdk.incubator.vector.FloatVector.fromArray(s, q, i)
          .fma(jdk.incubator.vector.FloatVector.fromArray(s, v, off + i), acc0);
      acc1 = jdk.incubator.vector.FloatVector.fromArray(s, q, i + lanes)
          .fma(jdk.incubator.vector.FloatVector.fromArray(s, v, off + i + lanes), acc1);
    }
    for (; i < upper; i += lanes) {
      acc0 = jdk.incubator.vector.FloatVector.fromArray(s, q, i)
          .fma(jdk.incubator.vector.FloatVector.fromArray(s, v, off + i), acc0);
    }
    float sum = acc0.add(acc1).reduceLanes(jdk.incubator.vector.VectorOperators.ADD);
    for (; i < n; i++) {
      sum += q[i] * v[off + i];
    }
    return sum;
  }

  @Override
  public float cosine(float[] q, float[] v, int off, int n) {
    var s = jdk.incubator.vector.FloatVector.SPECIES_PREFERRED;
    int lanes = s.length();
    int upper = s.loopBound(n);
    var dd = jdk.incubator.vector.FloatVector.zero(s);
    var qq = jdk.incubator.vector.FloatVector.zero(s);
    var vv = jdk.incubator.vector.FloatVector.zero(s);
    int i = 0;
    for (; i < upper; i += lanes) {
      var a = jdk.incubator.vector.FloatVector.fromArray(s, q, i);
      var b = jdk.incubator.vector.FloatVector.fromArray(s, v, off + i);
      dd = a.fma(b, dd);
      qq = a.fma(a, qq);
      vv = b.fma(b, vv);
    }
    float d = dd.reduceLanes(jdk.incubator.vector.VectorOperators.ADD);
    float nq = qq.reduceLanes(jdk.incubator.vector.VectorOperators.ADD);
    float nv = vv.reduceLanes(jdk.incubator.vector.VectorOperators.ADD);
    for (; i < n; i++) {
      float a = q[i];
      float b = v[off + i];
      d += a * b;
      nq += a * a;
      nv += b * b;
    }
    if (nq == 0.0f || nv == 0.0f) {
      return 0.0f;
    }
    return (float) (d / Math.sqrt((double) nq * (double) nv));
  }

  @Override
  public void dequant(byte[] codes, int base, int n, float[] mn, float[] st, float[] out) {
    var fs = jdk.incubator.vector.FloatVector.SPECIES_PREFERRED;
    int lanes = fs.length();
    // the byte vector carrying `lanes` codes is lanes*8 bits wide — only
    // legal for lanes >= 8 (64-bit shape); a 128-bit-float host (4 lanes)
    // falls through to the scalar tail, which is the whole loop there
    jdk.incubator.vector.VectorSpecies<Byte> bs = null;
    switch (lanes * 8) {
      case 64: bs = jdk.incubator.vector.ByteVector.SPECIES_64; break;
      case 128: bs = jdk.incubator.vector.ByteVector.SPECIES_128; break;
      case 256: bs = jdk.incubator.vector.ByteVector.SPECIES_256; break;
      default: break;
    }
    int i = 0;
    if (bs != null) {
      var is = jdk.incubator.vector.VectorSpecies.of(int.class, fs.vectorShape());
      int upper = fs.loopBound(n);
      for (; i < upper; i += lanes) {
        var bv = jdk.incubator.vector.ByteVector.fromArray(bs, codes, base + i);
        // signed B2I + AND 0xFF == zero extension (ZERO_EXTEND_B2I throws
        // on this JDK's resize path — the sign-extend conversion is the
        // one with a working intrinsic)
        var iv = ((jdk.incubator.vector.IntVector) bv.convertShape(
            jdk.incubator.vector.VectorOperators.B2I, is, 0))
            .lanewise(jdk.incubator.vector.VectorOperators.AND, 0xFF);
        var cv = (jdk.incubator.vector.FloatVector) iv.convert(
            jdk.incubator.vector.VectorOperators.I2F, 0);
        // mul then add (NOT fma): per-lane two-rounding order identical
        // to the scalar loop, so both paths dequantize bit-identically
        cv.mul(jdk.incubator.vector.FloatVector.fromArray(fs, st, i))
            .add(jdk.incubator.vector.FloatVector.fromArray(fs, mn, i))
            .intoArray(out, i);
      }
    }
    for (; i < n; i++) {
      out[i] = mn[i] + (codes[base + i] & 0xFF) * st[i];
    }
  }
}
