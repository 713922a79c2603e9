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
}
