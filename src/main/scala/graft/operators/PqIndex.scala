package graft.operators

import org.apache.spark.rdd.RDD
import java.util.stream.IntStream

/**
 * Product-quantized serving tiers (Jégou, Douze & Schmid, "Product
 * Quantization for Nearest Neighbor Search", TPAMI 2011) — the FAISS
 * `IndexPQ` / `IndexIVFPQ` regime. The reference benchmarks the FAISS
 * index families (`day_6/day6_complete.py:84-247`); PQ is the family's
 * deep-compression tier below SQ8: the vector is split into `m`
 * subspaces of `dim/m` dims, each subspace k-means-quantized to 256
 * codewords, so a vector costs `m` BYTES. At dim=384 with m=48 that is
 * 48 B/vector vs 1536 B float32 — 32× less resident memory, the
 * difference between 100 TB of embeddings needing 3 TB of executor RAM
 * instead of 100 TB.
 *
 * Search is asymmetric (ADC): the float query builds one `m × 256`
 * lookup table of per-subspace partial distances (`m·256·subDim` flops —
 * trivial), then each code scores in `m` table adds — 8× less compute
 * AND 32× less memory traffic than the float scan, which is what makes
 * the exhaustive PQ scan viable where the float scan is bandwidth-bound.
 *
 * Distribution model is the [[ServingIndex]] one: resident packed slabs,
 * one fused `runJob` per query batch, bounded per-partition heaps,
 * driver merge of partitions×|Q|×k. [[LocalPq]] is the driver-resident
 * twin for sub-budget corpora (the [[LocalServing]] posture).
 *
 * Codebooks are trained driver-side on a bounded SAMPLE (FAISS trains
 * the same way — quantizer training is sublinear in corpus size by
 * design): `sampleSize` vectors via `takeSample`, per-subspace Lloyd
 * iterations parallelized across the common pool. Training cost is
 * independent of corpus size; encode is one distributed pass.
 *
 * Metrics: L2 (table of squared sub-distances, summed, sqrt at report
 * time) and inner product (table of sub-dots, negated into min-order).
 * For cosine, L2-normalize vectors at build and query time and use
 * inner product — the [[ServingIndex.Ivf.search]] geometry note applies.
 */
object PqIndex {

  /** `m` codebooks of 256 codewords each, packed: codeword `c` of
    * subspace `j` lives at `cents[(j*256 + c) * subDim, +subDim)`.
    * `ksub` ≤ 256 codewords are trained (fewer iff the training sample
    * was smaller than 256). */
  final class Codebooks(val m: Int, val subDim: Int, val ksub: Int,
                        val cents: Array[Float]) extends Serializable {
    def dim: Int = m * subDim
    def bytesPerVector: Int = m

    /** Nearest codeword of subspace `j` for `v[j*subDim, +subDim)`.
      * The sd=4 branch (the default dim/4-subspace configuration) hoists
      * the query lanes into locals and unrolls — encode is the full-corpus
      * pass of every PQ build, and the generic loop's per-element bounds
      * checks dominated it. Accumulation order matches the generic loop,
      * so codes are bit-identical either way. */
    private[PqIndex] def assignSub(v: Array[Float], j: Int): Int = {
      val sd = subDim
      val base = j * sd
      var best = 0
      var bestD = Float.MaxValue
      var c = 0
      if (sd == 4) {
        val v0 = v(base); val v1 = v(base + 1)
        val v2 = v(base + 2); val v3 = v(base + 3)
        val cb0 = j * 256 * 4
        while (c < ksub) {
          val cb = cb0 + c * 4
          val d0 = v0 - cents(cb); val d1 = v1 - cents(cb + 1)
          val d2 = v2 - cents(cb + 2); val d3 = v3 - cents(cb + 3)
          var s = d0 * d0; s += d1 * d1; s += d2 * d2; s += d3 * d3
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
      } else {
        while (c < ksub) {
          val cb = (j * 256 + c) * sd
          var s = 0.0f
          var i = 0
          while (i < sd) {
            val d = v(base + i) - cents(cb + i)
            s += d * d
            i += 1
          }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
      }
      best
    }

    /** Encode a full vector to `m` bytes. */
    def encode(v: Array[Float]): Array[Byte] = {
      val out = new Array[Byte](m)
      var j = 0
      while (j < m) { out(j) = assignSub(v, j).toByte; j += 1 }
      out
    }

    /** Reconstruct (decode) a code — the quantized vector the ADC scan
      * effectively scores against. */
    def decode(code: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      var j = 0
      while (j < m) {
        val c = code(j) & 0xFF
        System.arraycopy(cents, (j * 256 + c) * subDim, out, j * subDim, subDim)
        j += 1
      }
      out
    }

    /** ADC lookup table for one query: `tab(j*256 + c)` = partial L2²
      * (or negated sub-dot for IP) between the query's subspace `j` and
      * codeword `c`. Min-order for both metrics. Metric dispatch hoisted
      * out of the `m·256·subDim` hot loop (the scanSlab rule) — table
      * builds run once per (query[, probed cell]) and dominate IVF+PQ
      * batch latency, so the inner loops stay branch-free. */
    private[operators] def adcTable(q: Array[Float], metric: KnnSearch.Metric): Array[Float] = {
      val tab = new Array[Float](m * 256)
      if (metric == KnnSearch.InnerProduct) adcTableIp(q, tab) else adcTableL2(q, tab)
      tab
    }

    private def adcTableL2(q: Array[Float], tab: Array[Float]): Unit = {
      val sd = subDim
      var j = 0
      while (j < m) {
        val qb = j * sd
        var c = 0
        while (c < ksub) {
          val cb = (j * 256 + c) * sd
          var s = 0.0f
          var i = 0
          while (i < sd) {
            val d = q(qb + i) - cents(cb + i)
            s += d * d
            i += 1
          }
          tab(j * 256 + c) = s
          c += 1
        }
        j += 1
      }
    }

    private def adcTableIp(q: Array[Float], tab: Array[Float]): Unit = {
      val sd = subDim
      var j = 0
      while (j < m) {
        val qb = j * sd
        var c = 0
        while (c < ksub) {
          val cb = (j * 256 + c) * sd
          var s = 0.0f
          var i = 0
          while (i < sd) {
            s += q(qb + i) * cents(cb + i)
            i += 1
          }
          tab(j * 256 + c) = -s
          c += 1
        }
        j += 1
      }
    }
  }

  /**
   * Bounded top-k as a binary heap (worst element at the root) — the
   * accumulator for LARGE k. [[ServingIndex.SortedTopK]]'s sorted-array
   * insertion is ideal at serving k (≤ tens: one cache line, O(k)
   * memmove amortized away by the fast reject) but degenerates to an
   * insertion sort when k approaches the stripe size — exactly the
   * candidate-generation regime ([[searchRefined]] over-fetches k′ in
   * the hundreds). The heap inserts in O(log k) and drains to the same
   * best-first sorted arrays the merge expects. Same (score, id) total
   * order as SortedTopK, so results are identical.
   */
  private final class HeapTopK(k: Int, desc: Boolean) {
    private val scores = new Array[Float](math.max(k, 1))
    private val ids = new Array[Long](math.max(k, 1))
    private var size = 0

    /** true iff (s1,i1) ranks WORSE than (s2,i2). */
    @inline private def worse(s1: Float, i1: Long, s2: Float, i2: Long): Boolean = {
      val c = java.lang.Float.compare(s1, s2)
      if (c != 0) { if (desc) c < 0 else c > 0 } else i1 > i2
    }

    def insert(s: Float, id: Long): Unit = {
      if (k == 0) return
      if (size < k) {
        var i = size
        scores(i) = s; ids(i) = id; size += 1
        // sift up towards the worst-at-root
        while (i > 0) {
          val p = (i - 1) >> 1
          if (worse(scores(i), ids(i), scores(p), ids(p))) {
            val ts = scores(i); scores(i) = scores(p); scores(p) = ts
            val ti = ids(i); ids(i) = ids(p); ids(p) = ti
            i = p
          } else i = 0
        }
      } else if (worse(scores(0), ids(0), s, id)) {
        scores(0) = s; ids(0) = id
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = l + 1
          var w = i
          if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
          if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
          if (w == i) done = true
          else {
            val ts = scores(i); scores(i) = scores(w); scores(w) = ts
            val ti = ids(i); ids(i) = ids(w); ids(w) = ti
            i = w
          }
        }
      }
    }

    /** Best-first sorted (scores, ids) — the SortedTopK output shape. */
    def drainSorted(): (Array[Float], Array[Long]) = {
      val order = Array.range(0, size).sortWith { (a, b) =>
        val c = java.lang.Float.compare(scores(a), scores(b))
        if (c != 0) { if (desc) c > 0 else c < 0 } else ids(a) < ids(b)
      }
      (order.map(scores), order.map(ids))
    }
  }

  /** Score one packed code against a query's ADC table: m table adds. */
  @inline private def adcScore(tab: Array[Float], codes: Array[Byte],
                               base: Int, m: Int): Float = {
    var s = 0.0f
    var j = 0
    while (j < m) {
      s += tab(j * 256 + (codes(base + j) & 0xFF))
      j += 1
    }
    s
  }

  /** Convert the min-order ADC accumulation to the metric's reported
    * score: sqrt for L2 (squared table entries), negate back for IP. */
  @inline private def reportScore(s: Float, l2: Boolean): Float =
    if (l2) math.sqrt(s.toDouble).toFloat else -s

  private def checkMetric(metric: KnnSearch.Metric): Boolean = metric match {
    case KnnSearch.L2 => true
    case KnnSearch.InnerProduct => false
    case KnnSearch.Cosine => throw new IllegalArgumentException(
      "PQ tiers score cosine as inner product over L2-normalized vectors — " +
        "normalize at build and query time and pass InnerProduct")
  }

  final case class PqSlab(ids: Array[Long], codes: Array[Byte])
  final case class IvfPqSlab(ids: Array[Long], codes: Array[Byte], offsets: Array[Int])

  // ----------------------------------------------------------- flat pq

  /** Exhaustive ADC scan over distributed code slabs. */
  final class Pq private[PqIndex] (
      val slabs: RDD[PqSlab], val books: Codebooks,
      val numVectors: Long) extends Serializable {

    def dim: Int = books.dim
    def bytesPerVector: Int = 8 + books.m

    def search(queries: Array[(Long, Array[Float])], k: Int,
               metric: KnnSearch.Metric = KnnSearch.L2): Array[(Long, Array[(Float, Long)])] = {
      val l2 = checkMetric(metric)
      val sc = slabs.sparkContext
      val bc = sc.broadcast(queries.map(_._2))
      val bks = books
      try {
        val perPartition: Array[Array[(Array[Float], Array[Long])]] =
          sc.runJob(slabs, (it: Iterator[PqSlab]) => {
            val qs = bc.value
            val m = bks.m
            val tabs = qs.map(q => bks.adcTable(q, metric))
            val acc = ServingIndex.emptyTopK(qs.length, k)
            it.foreach { slab =>
              val nv = slab.ids.length
              var vi = 0
              while (vi < nv) {
                val base = vi * m
                var qi = 0
                while (qi < qs.length) {
                  acc(qi).insert(reportScore(adcScore(tabs(qi), slab.codes, base, m), l2),
                    slab.ids(vi), desc = !l2)
                  qi += 1
                }
                vi += 1
              }
            }
            acc.map(h => (h.scores.take(h.size), h.ids.take(h.size)))
          })
        ServingIndex.mergeAcrossPartitions(queries, perPartition, k, desc = !l2)
      } finally bc.destroy()
    }
  }

  // ------------------------------------------------------------ ivf+pq

  /** The composed 100 TB tier: coarse IVF pruning (scan nprobe/nlist of
    * the corpus) over RESIDUAL product codes — each vector is encoded as
    * `v − coarseCentroid(cell)`, FAISS `IndexIVFPQ`'s construction, which
    * centers every cell's residual cloud at the origin so the shared
    * codebooks spend their 256 codewords on local structure instead of
    * absolute position. Search builds one ADC table per (query, probed
    * cell) from the query's own residual — nprobe·m·256·subDim flops per
    * query, still trivial next to the scan it prunes. */
  final class IvfPq private[PqIndex] (
      val slabs: RDD[IvfPqSlab], val coarse: Array[Array[Float]],
      val books: Codebooks, val numVectors: Long) extends Serializable {

    def nlist: Int = coarse.length
    def dim: Int = books.dim
    def bytesPerVector: Int = 8 + books.m

    def search(queries: Array[(Long, Array[Float])], k: Int, nprobe: Int,
               metric: KnnSearch.Metric = KnnSearch.L2): Array[(Long, Array[(Float, Long)])] = {
      val l2 = checkMetric(metric)
      require(l2, "IVF+PQ residual encoding is defined for L2 — use the flat Pq tier for IP")
      val sc = slabs.sparkContext
      // L2 probe ranking against the coarse centroids — the same geometry
      // the residuals were taken under (Ivf.search's note)
      val probes = ServingIndex.rankProbes(queries, coarse, nprobe)
      // residual ADC tables depend only on (query, probed cell). Shipping
      // them all would cost |Q|·nprobe·m·1 KB of broadcast (≈ 100 MB at
      // 100 queries × 10 probes × m=96) per batch; deriving ALL of them
      // up front per task would transiently hold that same ~100 MB in
      // EVERY concurrent task. So each task derives tables one QUERY at
      // a time — peak nprobe·m·1 KB (≈ 1 MB) per task, same total flops,
      // and at cluster scale per-executor work with no fat broadcast.
      // The slab loop nests INSIDE the query loop so a query's tables
      // are built once across all of the task's slabs.
      val bks = books
      val ctr = coarse
      val d = bks.dim
      val bc = sc.broadcast((queries.map(_._2), probes))
      try {
        val perPartition: Array[Array[(Array[Float], Array[Long])]] =
          sc.runJob(slabs, (it: Iterator[IvfPqSlab]) => {
            val (qs, pr) = bc.value
            val m = bks.m
            val nq = pr.length
            val slabArr = it.toArray // resident cached objects, no copy
            val acc = ServingIndex.emptyTopK(nq, k)
            val res = new Array[Float](d)
            var qi = 0
            while (qi < nq) {
              val p = pr(qi)
              val tabs = p.map { c =>
                val cc = ctr(c)
                var i = 0
                while (i < d) { res(i) = qs(qi)(i) - cc(i); i += 1 }
                bks.adcTable(res, KnnSearch.L2)
              }
              var si = 0
              while (si < slabArr.length) {
                val slab = slabArr(si)
                val ncl = slab.offsets.length - 1
                var pi = 0
                while (pi < p.length) {
                  val c = p(pi)
                  if (c < ncl && slab.offsets(c + 1) > slab.offsets(c)) {
                    val tab = tabs(pi)
                    var vi = slab.offsets(c)
                    val until = slab.offsets(c + 1)
                    while (vi < until) {
                      acc(qi).insert(reportScore(adcScore(tab, slab.codes, vi * m, m), l2 = true),
                        slab.ids(vi), desc = false)
                      vi += 1
                    }
                  }
                  pi += 1
                }
                si += 1
              }
              qi += 1
            }
            acc.map(h => (h.scores.take(h.size), h.ids.take(h.size)))
          })
        ServingIndex.mergeAcrossPartitions(queries, perPartition, k, desc = false)
      } finally bc.destroy()
    }
  }

  // ----------------------------------------------------------- training

  /**
   * Train `m` codebooks on a driver-side sample: seeded `takeSample`
   * (bounded — codebook training is sublinear in corpus size by design),
   * then per-subspace Lloyd with k-means++-style seeded init, subspaces
   * in parallel across the common pool. Deterministic for a fixed seed.
   */
  def trainCodebooks(vectors: RDD[(Long, Array[Float])], dim: Int, m: Int,
                     iterations: Int = 10, sampleSize: Int = 16384,
                     seed: Long = 42L): Codebooks =
    trainCodebooksOnSample(
      sampleVectors(vectors, dim, sampleSize, seed), dim, m, iterations, seed)

  /** The seeded, validity-filtered training sample — shared by the flat
    * and IVF builds so both pay exactly ONE sampling job. */
  private def sampleVectors(vectors: RDD[(Long, Array[Float])], dim: Int,
                            sampleSize: Int, seed: Long): Array[Array[Float]] =
    vectors
      .filter { case (_, v) => v != null && v.length == dim }
      .map(_._2)
      .takeSample(withReplacement = false, sampleSize, seed)

  /** Lloyd over an in-memory sample (the driver-side core of
    * [[trainCodebooks]]) — lets [[buildIvfPq]] residualize just the
    * sample instead of materializing a full-corpus residuals RDD. */
  private def trainCodebooksOnSample(sample: Array[Array[Float]], dim: Int, m: Int,
                                     iterations: Int, seed: Long): Codebooks = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sd = dim / m
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    val ksub = math.min(256, sample.length)
    val cents = new Array[Float](m * 256 * sd)
    IntStream.range(0, m).parallel().forEach { j =>
      // init: ksub distinct sample positions, seeded per subspace
      val rng = new java.util.Random(seed + j)
      val picks = rng.ints(0, sample.length).distinct().limit(ksub).toArray
      var c = 0
      while (c < ksub) {
        System.arraycopy(sample(picks(c)), j * sd, cents, (j * 256 + c) * sd, sd)
        c += 1
      }
      val n = sample.length
      // flatten this subspace's sample column into one primitive array:
      // the Lloyd loop below touches it ksub times per point per
      // iteration, and `sample(i)(j*sd+x)` pays a pointer chase + bounds
      // check per element — linearizing it (same values, same order, so
      // bit-identical codebooks) was worth ~2x on the build bench
      val sub = new Array[Float](n * sd)
      var p = 0
      while (p < n) {
        System.arraycopy(sample(p), j * sd, sub, p * sd, sd)
        p += 1
      }
      // local copy of this subspace's codeword block, same motivation
      val cb0 = j * 256 * sd
      // Lloyd over this subspace
      val assign = new Array[Int](n)
      var iter = 0
      while (iter < iterations) {
        var i = 0
        if (sd == 4) {
          // dominant configuration (dim/4 subspaces): fully unrolled,
          // accumulation order identical to the generic loop
          while (i < n) {
            val v0 = sub(i * 4); val v1 = sub(i * 4 + 1)
            val v2 = sub(i * 4 + 2); val v3 = sub(i * 4 + 3)
            var best = 0
            var bestD = Float.MaxValue
            var cc = 0
            while (cc < ksub) {
              val cb = cb0 + cc * 4
              val d0 = v0 - cents(cb); val d1 = v1 - cents(cb + 1)
              val d2 = v2 - cents(cb + 2); val d3 = v3 - cents(cb + 3)
              var s = d0 * d0; s += d1 * d1; s += d2 * d2; s += d3 * d3
              if (s < bestD) { bestD = s; best = cc }
              cc += 1
            }
            assign(i) = best
            i += 1
          }
        } else {
          while (i < n) {
            var best = 0
            var bestD = Float.MaxValue
            var cc = 0
            while (cc < ksub) {
              val cb = cb0 + cc * sd
              var s = 0.0f
              var x = 0
              while (x < sd) {
                val dxy = sub(i * sd + x) - cents(cb + x)
                s += dxy * dxy
                x += 1
              }
              if (s < bestD) { bestD = s; best = cc }
              cc += 1
            }
            assign(i) = best
            i += 1
          }
        }
        val sums = new Array[Double](ksub * sd)
        val counts = new Array[Int](ksub)
        i = 0
        while (i < n) {
          val a = assign(i)
          counts(a) += 1
          var x = 0
          while (x < sd) { sums(a * sd + x) += sub(i * sd + x); x += 1 }
          i += 1
        }
        var cc = 0
        while (cc < ksub) {
          if (counts(cc) > 0) {
            var x = 0
            while (x < sd) {
              cents((j * 256 + cc) * sd + x) = (sums(cc * sd + x) / counts(cc)).toFloat
              x += 1
            }
          } // empty codeword keeps its previous position (trainCentroids' rule)
          cc += 1
        }
        iter += 1
      }
    }
    new Codebooks(m, sd, ksub, cents)
  }

  // ------------------------------------------------------------- builds

  /** Train codebooks, then one distributed encode pass into resident
    * code slabs (the [[ServingIndex.buildFlat]] shape). */
  def buildPq(vectors0: RDD[(Long, Array[Float])], dim: Int, m: Int,
              iterations: Int = 10, sampleSize: Int = 16384, seed: Long = 42L,
              numSlabs: Int = -1): Pq = {
    val vectors =
      if (numSlabs > 0 && numSlabs < vectors0.getNumPartitions)
        vectors0.coalesce(numSlabs)
      else vectors0
    val pinned = vectors.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (pinned) vectors.cache()
    try {
      val books = trainCodebooks(vectors, dim, m, iterations, sampleSize, seed)
      packPq(vectors, books, numSlabs = -1, localCheckpoint = false)
    } finally if (pinned) vectors.unpersist(false)
  }

  /** Encode under PRE-TRAINED (frozen) codebooks — buildPq's pack pass,
    * also the compaction path of [[ServingIndex.mutablePq]]: re-encoding
    * a decoded reconstruction under the SAME codebooks is exact, so
    * quantized compaction never compounds error (the [[ServingIndex]]
    * frozen-quantizer rule). */
  private[operators] def packPq(vectors0: RDD[(Long, Array[Float])], books: Codebooks,
                                numSlabs: Int, localCheckpoint: Boolean): Pq = {
    val vectors =
      if (numSlabs > 0 && numSlabs < vectors0.getNumPartitions)
        vectors0.coalesce(numSlabs)
      else vectors0
    val bc = vectors.sparkContext.broadcast(books)
    val d = books.dim
    val slabs = vectors.mapPartitions({ it =>
      val bks = bc.value
      val ids = Array.newBuilder[Long]
      val codes = Array.newBuilder[Byte]
      it.foreach { case (id, v) =>
        if (v != null && v.length == d) { ids += id; codes ++= bks.encode(v) }
      }
      Iterator.single(PqSlab(ids.result(), codes.result()))
    }, preservesPartitioning = true).cache()
    // the lineage mark must precede the slabs' first job (buildFlat rule)
    if (localCheckpoint) slabs.localCheckpoint()
    val nv = slabs.map(_.ids.length.toLong).fold(0L)(_ + _)
    new Pq(slabs, books, nv)
  }

  /** Coarse Lloyd centroids (shared [[ServingIndex]] trainer), residual
    * codebooks (trained on sampled residuals), then one cluster-major
    * encode pass per partition — FAISS `IndexIVFPQ`'s construction on
    * the [[ServingIndex.buildIvf]] slab layout. */
  def buildIvfPq(vectors0: RDD[(Long, Array[Float])], dim: Int, nlist: Int, m: Int,
                 iterations: Int = 10, sampleSize: Int = 16384, seed: Long = 42L,
                 numSlabs: Int = -1): IvfPq = {
    val vectors =
      if (numSlabs > 0 && numSlabs < vectors0.getNumPartitions)
        vectors0.coalesce(numSlabs)
      else vectors0
    val pinned = vectors.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (pinned) vectors.cache()
    try {
      val d = dim
      val coarse = ServingIndex.trainCentroids(vectors, d, nlist, iterations, seed)
      val sc = vectors.sparkContext
      val bcCoarse = sc.broadcast(coarse)
      // codebooks train on residuals of the SAMPLE only: one sampling job
      // over the cached vectors, then driver-parallel residualization —
      // not a full-corpus residuals RDD whose every sampling/count pass
      // would redo the O(n·nlist·dim) assignment the encode pass below
      // already has to pay once
      val sampleRaw = sampleVectors(vectors, d, sampleSize, seed)
      val sampleRes = new Array[Array[Float]](sampleRaw.length)
      IntStream.range(0, sampleRaw.length).parallel().forEach { i =>
        val v = sampleRaw(i)
        val cc = coarse(ServingIndex.nearestCentroid(v, coarse))
        sampleRes(i) = Array.tabulate(d)(x => v(x) - cc(x))
      }
      val books = trainCodebooksOnSample(sampleRes, d, m, iterations, seed)
      val bcBooks = sc.broadcast(books)
      val slabs = vectors.mapPartitions({ it =>
        val cs = bcCoarse.value
        val bks = bcBooks.value
        val buf = it.filter { case (_, v) => v != null && v.length == d }.toArray
        val assign = buf.map { case (_, v) => ServingIndex.nearestCentroid(v, cs) }
        val counts = new Array[Int](cs.length)
        assign.foreach(c => counts(c) += 1)
        val offsets = new Array[Int](cs.length + 1)
        var c = 0
        while (c < cs.length) { offsets(c + 1) = offsets(c) + counts(c); c += 1 }
        val m0 = bks.m
        val ids = new Array[Long](buf.length)
        val codes = new Array[Byte](buf.length * m0)
        val cursor = offsets.clone()
        val res = new Array[Float](d)
        var i = 0
        while (i < buf.length) {
          val cell = assign(i)
          val slot = cursor(cell); cursor(cell) += 1
          ids(slot) = buf(i)._1
          val v = buf(i)._2
          val cc = cs(cell)
          var x = 0
          while (x < d) { res(x) = v(x) - cc(x); x += 1 }
          System.arraycopy(bks.encode(res), 0, codes, slot * m0, m0)
          i += 1
        }
        Iterator.single(IvfPqSlab(ids, codes, offsets))
      }, preservesPartitioning = true).cache()
      val nv = slabs.map(_.ids.length.toLong).fold(0L)(_ + _)
      new IvfPq(slabs, coarse, books, nv)
    } finally if (pinned) vectors.unpersist(false)
  }

  // ------------------------------------------------------- local tier

  /** Driver-resident PQ: packed codes in one array, thread-parallel
    * vector stripes (the [[LocalServing]] posture — same scores as the
    * distributed [[Pq]] by construction). */
  final class LocalPq private[PqIndex] (
      val ids: Array[Long], val codes: Array[Byte], val books: Codebooks) {

    def numVectors: Int = ids.length

    def search(queries: Array[(Long, Array[Float])], k: Int,
               metric: KnnSearch.Metric = KnnSearch.L2): Array[(Long, Array[(Float, Long)])] = {
      val l2 = checkMetric(metric)
      val n = ids.length
      val m = books.m
      val qs = queries.map(_._2)
      val tabs = qs.map(q => books.adcTable(q, metric))
      val par = LocalServing.commonPar
      // serving k → SortedTopK (cache-line array, fast reject); candidate
      // k′ (over-fetch) → HeapTopK, or the stripe degenerates into an
      // insertion sort of itself (see HeapTopK's scaladoc)
      val useHeap = k > 64
      // small scans skip the fan-out entirely (LocalServing's serial
      // floor): stripe dispatch + per-stripe×query accumulator allocs +
      // the cross-stripe merge dominate a scan one core finishes in ~2 ms
      val serial = n.toLong * qs.length * m < LocalServing.SerialWorkFloor
      // big-k stripes stay ≥ 4k vectors so per-stripe heap capacity (and
      // the per-stripe×query allocation) is amortized, not dominant
      val nStripes = if (serial) 1 else math.max(1, math.min(
        if (useHeap) math.min(4 * par, n / (4 * k) + 1) else 4 * par, n))
      val perStripe = new Array[Array[(Array[Float], Array[Long])]](nStripes)
      // QUERY-outer, vector-inner: one query's 256·m ADC table stays
      // L2-resident while the code rows stream sequentially — the
      // vector-outer order would cycle every query's table (|Q| × 100 KB)
      // through cache per vector. Per query the vi scan order is
      // unchanged, so tie order and results are identical either way.
      LocalServing.forStripes(nStripes, serial) { s =>
        val from = (n.toLong * s / nStripes).toInt
        val until = (n.toLong * (s + 1) / nStripes).toInt
        if (useHeap) {
          val acc = Array.fill(qs.length)(new HeapTopK(k, desc = !l2))
          var qi = 0
          while (qi < qs.length) {
            val tab = tabs(qi)
            val a = acc(qi)
            var vi = from
            while (vi < until) {
              a.insert(reportScore(adcScore(tab, codes, vi * m, m), l2), ids(vi))
              vi += 1
            }
            qi += 1
          }
          perStripe(s) = acc.map(_.drainSorted())
        } else {
          val acc = ServingIndex.emptyTopK(qs.length, k)
          var qi = 0
          while (qi < qs.length) {
            val tab = tabs(qi)
            val a = acc(qi)
            var vi = from
            while (vi < until) {
              a.insert(reportScore(adcScore(tab, codes, vi * m, m), l2),
                ids(vi), desc = !l2)
              vi += 1
            }
            qi += 1
          }
          perStripe(s) = acc.map(h => (h.scores.take(h.size), h.ids.take(h.size)))
        }
      }
      ServingIndex.mergeAcrossPartitions(queries, perStripe, k, desc = !l2)
    }
  }

  /**
   * PQ + exact refine (FAISS `IndexRefineFlat` regime): the quantized
   * scan over-fetches `kCand` candidates per query, then ONLY those
   * candidates are re-scored with exact float distances and the true
   * top-k kept. This is the standard answer to PQ's ranking blur on
   * hard (isotropic high-dim) data: on the day_6 large dataset, direct
   * PQ top-10 recall is ~0.2 while a 400-candidate refine reaches ~1.0 —
   * at the cost of `kCand · dim` exact flops per query (0.8 % of the
   * corpus), not a full float scan.
   *
   * `lookup` maps a candidate id to its float vector — the refine
   * source. At 100 TB that is the on-disk collection (point lookups of
   * kCand ids per query — the parquet id-filter path), NOT a resident
   * float tier; a resident [[LocalServing.LocalFlat]] works when memory
   * allows and is what the bench uses.
   */
  def searchRefined(pq: LocalPq, queries: Array[(Long, Array[Float])],
                    k: Int, kCand: Int,
                    lookup: Long => Array[Float],
                    metric: KnnSearch.Metric = KnnSearch.L2): Array[(Long, Array[(Float, Long)])] = {
    val l2 = checkMetric(metric)
    refineCandidates(pq.search(queries, kCand, metric), queries, k, lookup, l2)
  }

  /**
   * IVF-routed PQ + exact refine — [[searchRefined]]'s over-fetch/rerank
   * composed onto the [[LocalIvfPq]] tier. The coarse router and the
   * refine step fix INDEPENDENT errors: nprobe bounds which cells are
   * seen (cell recall), while the exact rerank undoes PQ's ranking blur
   * WITHIN the fetched candidates — so refined recall ≈ cell recall
   * (measured on the day_6 large set: IVF flat recall 1.0 at nprobe=10,
   * direct IVFPQ 0.46, refined IVFPQ back to ≈1.0). Cost stays
   * `kCand · dim` exact flops per query on top of the quantized probe
   * scan — the 16× code compression still does the corpus-wide work.
   */
  def searchRefinedIvf(ivfPq: LocalIvfPq, queries: Array[(Long, Array[Float])],
                       k: Int, kCand: Int, nprobe: Int,
                       lookup: Long => Array[Float]): Array[(Long, Array[(Float, Long)])] =
    refineCandidates(ivfPq.search(queries, kCand, nprobe), queries, k, lookup, l2 = true)

  /** Exact rerank of per-query candidate lists (the refine step shared by
    * flat-PQ and IVF-PQ refine): re-score each candidate with true float
    * distance via `lookup`, keep the top-k. */
  private def refineCandidates(cands: Array[(Long, Array[(Float, Long)])],
                               queries: Array[(Long, Array[Float])], k: Int,
                               lookup: Long => Array[Float],
                               l2: Boolean): Array[(Long, Array[(Float, Long)])] = {
    val out = new Array[(Long, Array[(Float, Long)])](queries.length)
    IntStream.range(0, queries.length).parallel().forEach { qi =>
      val q = queries(qi)._2
      val acc = ServingIndex.emptyTopK(1, k)
      val arr = cands(qi)._2
      var i = 0
      while (i < arr.length) {
        val id = arr(i)._2
        val v = lookup(id)
        if (v != null) {
          val s =
            if (l2) math.sqrt(KnnSearch.F32Kernels.l2sq(q, v, 0, v.length).toDouble).toFloat
            else KnnSearch.F32Kernels.dot(q, v, 0, v.length)
          acc(0).insert(s, id, desc = !l2)
        }
        i += 1
      }
      val h = acc(0)
      out(qi) = (queries(qi)._1, Array.tabulate(h.size)(j => (h.scores(j), h.ids(j))))
    }
    out
  }

  /** Id → vector lookup over a resident [[LocalServing.LocalFlat]] —
    * the in-memory refine source for [[searchRefined]]. */
  def flatLookup(flat: LocalServing.LocalFlat): Long => Array[Float] = {
    val idx = new java.util.HashMap[Long, Integer](flat.numVectors * 2)
    var i = 0
    while (i < flat.numVectors) { idx.put(flat.ids(i), i); i += 1 }
    val d = flat.dim
    (id: Long) => {
      val pos = idx.get(id)
      if (pos == null) null
      else {
        val v = new Array[Float](d)
        System.arraycopy(flat.data, pos * d, v, 0, d)
        v
      }
    }
  }

  /** Driver-resident IVF+PQ: cluster-major codes over the whole corpus
    * (≈ m bytes/vector — 50k×384 floats collapse to under 5 MB), searched
    * query-parallel: each query ranks probes, builds its own nprobe
    * residual tables ONCE (no per-slab redundancy — the distributed
    * tier's one structural overhead), and range-scans the probed cells.
    * Same scores as [[IvfPq]] by construction. */
  final class LocalIvfPq private[PqIndex] (
      val ids: Array[Long], val codes: Array[Byte], val offsets: Array[Int],
      val coarse: Array[Array[Float]], val books: Codebooks) {

    def numVectors: Int = ids.length
    def nlist: Int = coarse.length

    def search(queries: Array[(Long, Array[Float])], k: Int, nprobe: Int,
               metric: KnnSearch.Metric = KnnSearch.L2): Array[(Long, Array[(Float, Long)])] = {
      val l2 = checkMetric(metric)
      require(l2, "IVF+PQ residual encoding is defined for L2 — use the flat Pq tier for IP")
      val m = books.m
      val d = books.dim
      val probes = ServingIndex.rankProbes(queries, coarse, nprobe)
      val out = new Array[(Long, Array[(Float, Long)])](queries.length)
      IntStream.range(0, queries.length).parallel().forEach { qi =>
        val q = queries(qi)._2
        val res = new Array[Float](d)
        val acc = ServingIndex.emptyTopK(1, k)
        val p = probes(qi)
        var pi = 0
        while (pi < p.length) {
          val c = p(pi)
          val cc = coarse(c)
          var i = 0
          while (i < d) { res(i) = q(i) - cc(i); i += 1 }
          val tab = books.adcTable(res, KnnSearch.L2)
          var vi = offsets(c)
          val until = offsets(c + 1)
          while (vi < until) {
            acc(0).insert(reportScore(adcScore(tab, codes, vi * m, m), l2 = true),
              ids(vi), desc = false)
            vi += 1
          }
          pi += 1
        }
        val h = acc(0)
        out(qi) = (queries(qi)._1, Array.tabulate(h.size)(j => (h.scores(j), h.ids(j))))
      }
      out
    }
  }

  /** Collect a distributed IVF+PQ index into the local tier: per-slab
    * cluster ranges concatenated cell-by-cell (the
    * [[LocalServing.ivfFrom]] layout, code-width m instead of dim). */
  def localIvfPqFrom(index: IvfPq, maxBytes: Long = 2L << 30): LocalIvfPq = {
    LocalServing.checkBudget(index.numVectors, 8L + index.books.m, maxBytes)
    val slabs = index.slabs.collect()
    val m = index.books.m
    val nlist = index.nlist
    val cellCounts = new Array[Int](nlist)
    slabs.foreach { s =>
      var c = 0
      while (c < nlist) { cellCounts(c) += s.offsets(c + 1) - s.offsets(c); c += 1 }
    }
    val offsets = new Array[Int](nlist + 1)
    var c = 0
    while (c < nlist) { offsets(c + 1) = offsets(c) + cellCounts(c); c += 1 }
    val n = offsets(nlist)
    val ids = new Array[Long](n)
    val codes = new Array[Byte](n * m)
    val cursor = offsets.clone()
    slabs.foreach { s =>
      var cc = 0
      while (cc < nlist) {
        val len = s.offsets(cc + 1) - s.offsets(cc)
        if (len > 0) {
          System.arraycopy(s.ids, s.offsets(cc), ids, cursor(cc), len)
          System.arraycopy(s.codes, s.offsets(cc) * m, codes, cursor(cc) * m, len * m)
          cursor(cc) += len
        }
        cc += 1
      }
    }
    new LocalIvfPq(ids, codes, offsets, index.coarse, index.books)
  }

  /** Collect a distributed PQ index into the local tier (budget-gated —
    * codes are m bytes/vector, so the budget is rarely the constraint). */
  def localFrom(index: Pq, maxBytes: Long = 2L << 30): LocalPq = {
    LocalServing.checkBudget(index.numVectors, 8L + index.books.m, maxBytes)
    val slabs = index.slabs.collect()
    val n = slabs.map(_.ids.length).sum
    val ids = new Array[Long](n)
    val codes = new Array[Byte](n * index.books.m)
    var off = 0
    slabs.foreach { s =>
      System.arraycopy(s.ids, 0, ids, off, s.ids.length)
      System.arraycopy(s.codes, 0, codes, off * index.books.m, s.codes.length)
      off += s.ids.length
    }
    new LocalPq(ids, codes, index.books)
  }
}
