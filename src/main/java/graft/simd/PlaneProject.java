package graft.simd;

/**
 * SIMD kernel for hyperplane-LSH signature banding, vectorized ACROSS
 * PLANES instead of across dims: one double lane per plane, iterating
 * dims sequentially. Each lane l therefore accumulates
 * {@code acc_l += plane_l[i] * (double) v[i]} in exactly the scalar
 * loop's order with exactly the scalar loop's two IEEE roundings per
 * step (lanewise MUL then ADD — never {@code fma}, which would fuse
 * them into one rounding), so every sign decision is bit-identical to
 * the scalar banding kernel. That is the property that lets the LSH
 * operators swap this in without changing a single bucket: a
 * dim-vectorized dot product would reassociate the sum and could flip
 * near-zero projections.
 *
 * Same deliberate constraints as {@link VectorF32}: only method BODIES
 * touch {@code jdk.incubator.vector} (fully-qualified, no imports), so
 * loading the class succeeds on a JVM without the incubator module and
 * the first call throws {@code NoClassDefFoundError}, which the
 * Scala-side probe (PlaneProjector) catches to select the scalar path.
 */
public final class PlaneProject {

  /** Lanes of the preferred double species (8 on AVX-512 — exactly one
   *  8-bit band group per vector). */
  public static int laneCount() {
    return jdk.incubator.vector.DoubleVector.SPECIES_PREFERRED.length();
  }

  /**
   * Sign bits of up to one lane-group of plane projections. {@code flat}
   * is dim-major transposed: {@code flat[i * lanes + l]} is plane l's
   * coefficient for dim i (zero-padded beyond the group's real planes);
   * lane l's accumulation order over i is the scalar loop's. Returns a
   * bitmask over the group's {@code nBits} planes (bit l set iff the
   * projection onto plane l is strictly positive).
   */
  public static long signBits(double[] flat, int nBits, float[] v, int nDims) {
    var sp = jdk.incubator.vector.DoubleVector.SPECIES_PREFERRED;
    int lanes = sp.length();
    var acc = jdk.incubator.vector.DoubleVector.zero(sp);
    for (int i = 0; i < nDims; i++) {
      var p = jdk.incubator.vector.DoubleVector.fromArray(sp, flat, i * lanes);
      acc = acc.add(p.mul((double) v[i]));
    }
    long sig = 0L;
    for (int b = 0; b < nBits; b++) {
      if (acc.lane(b) > 0.0) {
        sig |= 1L << b;
      }
    }
    return sig;
  }
}
