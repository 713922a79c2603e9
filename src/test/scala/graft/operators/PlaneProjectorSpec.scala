package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/**
 * Forced bit-parity gate for the plane-parallel SIMD banding kernel
 * (graft.simd.PlaneProject via SimilarityJoin.PlaneProjector): the LSH
 * operators may only use it because every sign decision is IDENTICAL
 * to the scalar loop's — lanes run across planes, dims stay sequential,
 * mul/add stay two separate roundings. These tests pin that claim on
 * randomized widths (including zero-padding and the multi-group path)
 * and end-to-end through the cosineBuckets operator, so a kernel change
 * that reassociates the accumulation fails CI instead of silently
 * moving vectors between buckets.
 */
class PlaneProjectorSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("SIMD plane projector is available and passes its self-probe on this JVM") {
    assert(SimilarityJoin.PlaneProjector.simdAvailable,
      "jdk.incubator.vector should be enabled in this build (see build.sbt)")
  }

  test("SIMD signatures are bit-identical to the scalar loop across widths, padding, and ragged rows") {
    val rng = new scala.util.Random(123)
    for (dim <- Seq(16, 33, 64, 384); bits <- Seq(4, 8, 11, 24); bands <- Seq(2, 3)) {
      val ps = SimilarityJoin.hyperplanes(dim, bits, bands, seed = dim * 1000L + bits)
      val simd = new SimilarityJoin.PlaneProjector(ps, useSimd = true)
      val scalar = new SimilarityJoin.PlaneProjector(ps, useSimd = false)
      (0 until 25).foreach { k =>
        val v = Array.fill(dim)((rng.nextGaussian() * 3).toFloat)
        (0 until bands).foreach { bi =>
          assert(simd.signature(bi, v) === scalar.signature(bi, v),
            s"sign divergence at dim=$dim bits=$bits band=$bi draw=$k")
        }
      }
      // a ragged vector (length ≠ table dim) must take the scalar
      // fallback row-wise — same answer either way
      val short = Array.fill(dim - 1)(rng.nextGaussian().toFloat)
      (0 until bands).foreach(bi =>
        assert(simd.signature(bi, short) === scalar.signature(bi, short)))
    }
  }

  test("cosineBuckets emits exactly the scalar banding keys (operator end-to-end parity)") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = Array.tabulate(200)(i =>
      (i.toLong, Array.fill(48)(rng.nextGaussian().toFloat)))
    val df = rows.toSeq.toDF("id", "v")
    val got = SimilarityJoin.cosineBuckets(df, "id", "v",
        numBits = 9, bands = 5, dim = 48, seed = 99L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ps = SimilarityJoin.hyperplanes(48, 9, 5, 99L)
    val scalar = new SimilarityJoin.PlaneProjector(ps, useSimd = false)
    val want = rows.flatMap { case (id, v) =>
      (0 until 5).map(bi => ((bi.toLong << 9) | scalar.signature(bi, v), id))
    }.toSet
    assert(got === want)
  }
}
