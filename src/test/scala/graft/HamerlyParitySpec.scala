package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/**
 * The Hamerly-pruned Lloyd in `ServingIndex.trainCentroids` claims
 * BIT-IDENTICAL centroids to the unpruned fixed-block trainer: a skip
 * fires only when the padded bounds strictly separate the assigned
 * centroid from every other, so the argmin a full scan would compute is
 * provably unchanged. This spec holds the pruned trainer against a
 * verbatim re-implementation of the unpruned one (the pre-round-7 loop)
 * on the pruning-hostile case (uniform vectors — near-ties everywhere)
 * and the friendly one (well-separated gaussians).
 */
class HamerlyParitySpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  /** The unpruned fixed-block trainer, kept verbatim as the oracle. */
  private def naiveTrain(sample: Array[Array[Float]], d: Int, nlist: Int,
                         iterations: Int): Array[Array[Float]] = {
    var centroids: Array[Array[Float]] = sample.take(nlist).map(_.clone())
    val n = sample.length
    val nThreads = n / 1024 + 1
    var iter = 0
    while (iter < iterations) {
      val cs = centroids
      val partial = new Array[(Array[Double], Array[Long])](nThreads)
      java.util.stream.IntStream.range(0, nThreads).parallel().forEach { t =>
        val sums = new Array[Double](nlist * d)
        val counts = new Array[Long](nlist)
        val from = (n.toLong * t / nThreads).toInt
        val until = (n.toLong * (t + 1) / nThreads).toInt
        var p = from
        while (p < until) {
          val v = sample(p)
          var best = 0
          var bestD = Float.MaxValue
          var c = 0
          while (c < nlist) {
            val s = KnnSearch.F32Kernels.l2sq(v, cs(c), 0, d)
            if (s < bestD) { bestD = s; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < d) { sums(best * d + i) += v(i); i += 1 }
          p += 1
        }
        partial(t) = (sums, counts)
      }
      val sums = new Array[Double](nlist * d)
      val counts = new Array[Long](nlist)
      partial.foreach { case (s, c) =>
        var i = 0
        while (i < sums.length) { sums(i) += s(i); i += 1 }
        var j = 0
        while (j < nlist) { counts(j) += c(j); j += 1 }
      }
      val prev = centroids
      centroids = Array.tabulate(nlist) { c =>
        if (counts(c) == 0) prev(c)
        else Array.tabulate(d)(i => (sums(c * d + i) / counts(c)).toFloat)
      }
      iter += 1
    }
    centroids
  }

  private def assertParity(gen: (Int, java.util.Random) => Array[Float],
                           n: Int, d: Int, nlist: Int, seed: Long): Unit = {
    val sc = spark.sparkContext
    val rdd = sc.parallelize(0L until n.toLong, 8).map { id =>
      val r = new java.util.Random(seed * 7919L + id)
      (id, gen(d, r))
    }.cache()
    rdd.count()
    try {
      val pruned = ServingIndex.trainCentroids(rdd, d, nlist,
        iterations = 10, seed = seed)
      // the oracle trains on the exact sample trainCentroids drew
      val cap = math.max(nlist, nlist * 256)
      val sample = rdd.filter { case (_, v) => v != null && v.length == d }
        .takeSample(withReplacement = false, cap, seed).map(_._2)
      val naive = naiveTrain(sample, d, nlist, iterations = 10)
      assert(pruned.length === naive.length)
      pruned.zip(naive).zipWithIndex.foreach { case ((p, q), c) =>
        assert(p.sameElements(q), s"centroid $c diverged")
      }
    } finally rdd.unpersist(false)
  }

  test("uniform vectors (near-tie-dense): pruned == naive, bit-exact") {
    val uni = (d: Int, r: java.util.Random) =>
      Array.fill(d)(r.nextFloat() * 2f - 1f)
    assertParity(uni, n = 3000, d = 24, nlist = 16, seed = 11L)
    assertParity(uni, n = 2000, d = 8, nlist = 5, seed = 23L)
  }

  test("clustered gaussians (prune-friendly): pruned == naive, bit-exact") {
    val clustered = (d: Int, r: java.util.Random) => {
      val ctr = r.nextInt(12)
      val cr = new java.util.Random(1000L + ctr)
      val base = Array.fill(d)(cr.nextGaussian().toFloat * 5f)
      Array.tabulate(d)(i => base(i) + r.nextGaussian().toFloat * 0.3f)
    }
    assertParity(clustered, n = 4000, d = 32, nlist = 12, seed = 42L)
  }

  test("single-cell corner: nlist = 1 trains the global mean") {
    val sc = spark.sparkContext
    val rdd = sc.parallelize(0L until 500L, 4).map { id =>
      val r = new java.util.Random(id)
      (id, Array.fill(6)(r.nextFloat()))
    }.cache()
    try {
      val cs = ServingIndex.trainCentroids(rdd, 6, 1, iterations = 5, seed = 3L)
      assert(cs.length === 1)
      assert(cs(0).forall(x => x >= 0f && x <= 1f))
    } finally rdd.unpersist(false)
  }
}
