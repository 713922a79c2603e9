package graft

import graft.operators.{KnnSearch, PqIndex, ServingIndex}
import org.scalatest.funsuite.AnyFunSuite

class PqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 32
  private val n = 2000
  private val m = 8 // subDim 4

  private def corpus = ClusteredFixture.corpus(spark, n, dim)
  private def queries = ClusteredFixture.queries(25, dim)

  test("ADC score equals the exact distance to the DECODED vector") {
    // the defining PQ identity: table-summed score ≡ distance between the
    // query and the reconstruction — checked through the public surface
    // by scoring a corpus of already-quantized vectors (decode(encode(v)))
    // where ADC is then EXACT
    val docs = corpus.cache(); docs.count()
    val pq = PqIndex.buildPq(docs, dim, m, iterations = 5)
    val books = pq.books
    val decoded = docs.map { case (id, v) => (id, books.decode(books.encode(v))) }
      .cache()
    decoded.count()
    val flatOnDecoded = ServingIndex.buildFlat(decoded, dim)
    val a = pq.search(queries, 10, KnnSearch.L2)
    val b = flatOnDecoded.search(queries, 10, KnnSearch.L2)
    a.zip(b).foreach { case ((qa, ra), (qb, rb)) =>
      assert(qa === qb)
      assert(ra.map(_._2).toSeq === rb.map(_._2).toSeq, s"ids for query $qa")
      ra.zip(rb).foreach { case ((sa, _), (sb, _)) =>
        assert(math.abs(sa - sb) <= 1e-3f, s"query $qa: $sa vs $sb")
      }
    }
    pq.slabs.unpersist(); flatOnDecoded.slabs.unpersist()
    decoded.unpersist(); docs.unpersist()
  }

  test("flat PQ recall@10 vs exact; over-fetch covers the serving pattern") {
    val docs = corpus.cache(); docs.count()
    val flat = ServingIndex.buildFlat(docs, dim)
    val pq = PqIndex.buildPq(docs, dim, m, iterations = 10)
    val exact = flat.search(queries, 10, KnnSearch.L2)
    val exactSets = exact.map { case (q, arr) => q -> arr.map(_._2).toSet }.toMap
    def recallAt(res: Array[(Long, Array[(Float, Long)])]): Double =
      res.map { case (q, arr) =>
        arr.map(_._2).count(exactSets(q).contains).toDouble / exactSets(q).size
      }.sum / res.length
    // direct top-10 at 16x compression loses some neighbors — that is the
    // PQ trade (FAISS IndexPQ behaves the same); the contract is a floor
    val direct = recallAt(pq.search(queries, 10, KnnSearch.L2))
    assert(direct >= 0.5, s"flat PQ recall@10 = $direct (m=$m over dim=$dim)")
    // the standard serving pattern: PQ as CANDIDATE GENERATOR — over-fetch
    // 4k quantized candidates, exact-rerank the shortlist (IndexRefineFlat
    // regime). The exact top-10 must live in the 4k candidate set.
    val candidates = recallAt(pq.search(queries, 40, KnnSearch.L2))
    assert(candidates >= 0.9,
      s"exact top-10 coverage in 4x over-fetched PQ candidates = $candidates")
    flat.slabs.unpersist(); pq.slabs.unpersist(); docs.unpersist()
  }

  test("IVF+PQ residual tier: recall holds at partial probe") {
    val docs = corpus.cache(); docs.count()
    val flat = ServingIndex.buildFlat(docs, dim)
    val ivfpq = PqIndex.buildIvfPq(docs, dim, nlist = 20, m = m, iterations = 10)
    val exact = flat.search(queries, 10, KnnSearch.L2)
    val approx = ivfpq.search(queries, 10, nprobe = 5, KnnSearch.L2)
    val exactSets = exact.map { case (q, arr) => q -> arr.map(_._2).toSet }.toMap
    val recall = approx.map { case (q, arr) =>
      arr.map(_._2).count(exactSets(q).contains).toDouble / exactSets(q).size
    }.sum / approx.length
    assert(recall >= 0.5, s"IVF+PQ recall@10 = $recall at nprobe 5/20")
    flat.slabs.unpersist(); ivfpq.slabs.unpersist(); docs.unpersist()
  }

  test("residual codes beat direct codes at equal budget (the IVFPQ point)") {
    val docs = corpus.cache(); docs.count()
    val flat = ServingIndex.buildFlat(docs, dim)
    val exact = flat.search(queries, 10, KnnSearch.L2)
    val exactSets = exact.map { case (q, arr) => q -> arr.map(_._2).toSet }.toMap
    def recallOf(res: Array[(Long, Array[(Float, Long)])]): Double =
      res.map { case (q, arr) =>
        arr.map(_._2).count(exactSets(q).contains).toDouble / exactSets(q).size
      }.sum / res.length
    val pq = PqIndex.buildPq(docs, dim, m, iterations = 10)
    val ivfpq = PqIndex.buildIvfPq(docs, dim, nlist = 20, m = m, iterations = 10)
    // full probe isolates the encoding difference from the pruning loss
    val rPq = recallOf(pq.search(queries, 10, KnnSearch.L2))
    val rRes = recallOf(ivfpq.search(queries, 10, nprobe = 20, KnnSearch.L2))
    assert(rRes >= rPq - 0.02,
      s"residual recall $rRes should not lose to direct-code recall $rPq")
    flat.slabs.unpersist(); pq.slabs.unpersist(); ivfpq.slabs.unpersist()
    docs.unpersist()
  }

  test("PQ + exact refine recovers exact top-k (IndexRefineFlat regime)") {
    val docs = corpus.cache(); docs.count()
    val flat = ServingIndex.buildFlat(docs, dim)
    val localFlat = graft.operators.LocalServing.flatFrom(flat)
    val pq = PqIndex.buildPq(docs, dim, m, iterations = 10)
    val localPq = PqIndex.localFrom(pq)
    val exact = localFlat.search(queries, 10, KnnSearch.L2)
    val refined = PqIndex.searchRefined(localPq, queries, 10, kCand = 200,
      PqIndex.flatLookup(localFlat), KnnSearch.L2)
    val exactSets = exact.map { case (q, arr) => q -> arr.map(_._2).toSet }.toMap
    val recall = refined.map { case (q, arr) =>
      arr.map(_._2).count(exactSets(q).contains).toDouble / exactSets(q).size
    }.sum / refined.length
    assert(recall >= 0.95, s"refined recall@10 = $recall with kCand=200")
    // refined scores are EXACT distances (scalar kernel), so any id the
    // exact search also returned must carry the same score to 1e-4
    val exactScores = exact.flatMap { case (q, arr) =>
      arr.map { case (s, id) => (q, id) -> s } }.toMap
    refined.foreach { case (q, arr) =>
      arr.foreach { case (s, id) =>
        exactScores.get((q, id)).foreach(es =>
          assert(math.abs(s - es) <= 1e-4f, s"query $q id $id: $s vs $es"))
      }
    }
    flat.slabs.unpersist(); pq.slabs.unpersist(); docs.unpersist()
  }

  test("IVF-routed PQ + exact refine recovers cell recall (the ivfpq_refined tier)") {
    val docs = corpus.cache(); docs.count()
    val flat = ServingIndex.buildFlat(docs, dim)
    val localFlat = graft.operators.LocalServing.flatFrom(flat)
    val ivfpq = PqIndex.buildIvfPq(docs, dim, nlist = 20, m = m, iterations = 10)
    val localIvfPq = PqIndex.localIvfPqFrom(ivfpq)
    val exact = localFlat.search(queries, 10, KnnSearch.L2)
    val exactSets = exact.map { case (q, arr) => q -> arr.map(_._2).toSet }.toMap
    def recallOf(res: Array[(Long, Array[(Float, Long)])]): Double =
      res.map { case (q, arr) =>
        arr.map(_._2).count(exactSets(q).contains).toDouble / exactSets(q).size
      }.sum / res.length
    // full probe isolates the refine effect: direct IVFPQ is blurred by
    // quantization; the refined composition must recover near-exact
    val direct = recallOf(localIvfPq.search(queries, 10, nprobe = 20))
    val refined = PqIndex.searchRefinedIvf(localIvfPq, queries, 10,
      kCand = 200, nprobe = 20, PqIndex.flatLookup(localFlat))
    val rRef = recallOf(refined)
    assert(rRef >= 0.95, s"refined IVFPQ recall@10 = $rRef (direct was $direct)")
    assert(rRef >= direct - 1e-9, "refine must never lose to the direct scan")
    // partial probe: refined recall is bounded by cell recall, not PQ blur
    val refinedPartial = recallOf(PqIndex.searchRefinedIvf(localIvfPq, queries, 10,
      kCand = 200, nprobe = 5, PqIndex.flatLookup(localFlat)))
    val cellRecall = recallOf(localIvfPq.search(queries, 200, nprobe = 5)
      .map { case (q, arr) => (q, arr.take(200)) })
    assert(refinedPartial >= 0.5, s"partial-probe refined recall $refinedPartial")
    flat.slabs.unpersist(); ivfpq.slabs.unpersist(); docs.unpersist()
    assert(cellRecall >= refinedPartial - 0.05)
  }

  test("local PQ equals distributed PQ") {
    val docs = corpus.cache(); docs.count()
    val dist = PqIndex.buildPq(docs, dim, m, iterations = 5)
    val local = PqIndex.localFrom(dist)
    assert(local.numVectors === n)
    val a = local.search(queries, 10, KnnSearch.L2)
      .flatMap { case (q, arr) => arr.map { case (s, i) => (q, i, s) } }.toSeq
    val b = dist.search(queries, 10, KnnSearch.L2)
      .flatMap { case (q, arr) => arr.map { case (s, i) => (q, i, s) } }.toSeq
    assert(a === b)
    // large-k (heap accumulator) path agrees with the distributed tier too
    val ah = local.search(queries, 200, KnnSearch.L2)
      .flatMap { case (q, arr) => arr.map { case (s, i) => (q, i, s) } }.toSeq
    val bh = dist.search(queries, 200, KnnSearch.L2)
      .flatMap { case (q, arr) => arr.map { case (s, i) => (q, i, s) } }.toSeq
    assert(ah === bh)
    dist.slabs.unpersist(); docs.unpersist()
  }

  test("local IVF+PQ equals distributed IVF+PQ") {
    val docs = corpus.cache(); docs.count()
    val dist = PqIndex.buildIvfPq(docs, dim, nlist = 20, m = m, iterations = 5)
    val local = PqIndex.localIvfPqFrom(dist)
    assert(local.numVectors === n)
    assert(local.nlist === 20)
    for (nprobe <- Seq(3, 20)) {
      val a = local.search(queries, 10, nprobe, KnnSearch.L2)
        .flatMap { case (q, arr) => arr.map { case (s, i) => (q, i, s) } }.toSeq
      val b = dist.search(queries, 10, nprobe, KnnSearch.L2)
        .flatMap { case (q, arr) => arr.map { case (s, i) => (q, i, s) } }.toSeq
      assert(a === b, s"nprobe=$nprobe")
    }
    dist.slabs.unpersist(); docs.unpersist()
  }

  test("inner-product metric and cosine guidance") {
    val docs = corpus.cache(); docs.count()
    val pq = PqIndex.buildPq(docs, dim, m, iterations = 5)
    val res = pq.search(queries, 5, KnnSearch.InnerProduct)
    assert(res.forall(_._2.length === 5))
    // IP results are ranked descending
    assert(res.forall { case (_, arr) =>
      arr.map(_._1).toSeq === arr.map(_._1).toSeq.sortBy(-_)
    })
    intercept[IllegalArgumentException] {
      pq.search(queries, 5, KnnSearch.Cosine)
    }
    pq.slabs.unpersist(); docs.unpersist()
  }

  test("deterministic training and the 32x memory story") {
    val docs = corpus.cache(); docs.count()
    val b1 = PqIndex.trainCodebooks(docs, dim, m, iterations = 3, seed = 7L)
    val b2 = PqIndex.trainCodebooks(docs, dim, m, iterations = 3, seed = 7L)
    assert(b1.cents.toSeq === b2.cents.toSeq)
    assert(b1.bytesPerVector === m)
    assert(4 * dim / b1.bytesPerVector === 16, "32 dims float32 -> m=8 is 16x")
    docs.unpersist()
  }

  test("k = 0, k > corpus, and empty partitions behave") {
    val tiny = spark.sparkContext.parallelize(
      (0L until 10L).map(i => (i, Array.tabulate(dim)(x => (i + x).toFloat))), 8)
    val pq = PqIndex.buildPq(tiny, dim, m, iterations = 2, sampleSize = 10)
    val q = Array((0L, Array.tabulate(dim)(_.toFloat)))
    assert(pq.search(q, 0, KnnSearch.L2)(0)._2.isEmpty)
    assert(pq.search(q, 50, KnnSearch.L2)(0)._2.length === 10)
    pq.slabs.unpersist()
  }

  test("mutable PQ: float delta is exact, frozen-codebook compaction is lossless") {
    val docs = corpus.cache(); docs.count()
    val idx = ServingIndex.mutablePq(docs, dim, m, iterations = 5)
    val base = PqIndex.buildPq(docs, dim, m, iterations = 5)
    def flat(res: Array[(Long, Array[(Float, Long)])]) =
      res.toSeq.map { case (q, arr) => (q, arr.toSeq) }
    // unmutated: identical to the immutable quantized tier
    assert(flat(idx.search(queries, 10, KnnSearch.L2)) ===
      flat(base.search(queries, 10, KnnSearch.L2)))
    base.slabs.unpersist()
    // a fresh upsert lives in the float delta: searching its exact vector
    // returns it at distance 0 (no quantization on the memtable)
    val probe = ClusteredFixture.queries(1, dim).head._2
    idx.upsert(777777L, probe)
    val hit = idx.search(Array((0L, probe)), 1, KnnSearch.L2).head._2.head
    assert(hit._2 === 777777L && hit._1 === 0f)
    // delete-only compaction: surviving codes re-encode under the frozen
    // codebooks — results bit-identical before and after
    idx.delete(777777L)
    Seq(1L, 2L, 3L).foreach(idx.delete)
    val before = flat(idx.search(queries, 10, KnnSearch.L2))
    idx.compact()
    assert(idx.deltaSize === 0 && idx.tombstoneCount === 0)
    assert(flat(idx.search(queries, 10, KnnSearch.L2)) === before)
    docs.unpersist()
  }
}
