package graft

import graft.operators.{KnnSearch, ServingIndex}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

class MutableServingIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 16
  private val n = 400

  private def vec(seed: Long): Array[Float] = {
    val r = new java.util.Random(seed)
    Array.fill(dim)(r.nextGaussian().toFloat)
  }

  private def baseRows: Seq[(Long, Array[Float])] =
    (0L until n.toLong).map(id => (id, vec(100L + id)))

  private def baseRdd = spark.sparkContext.parallelize(baseRows, 4)

  private def queries = (0 until 10).map(q => (q.toLong, vec(9000L + q))).toArray

  /** Brute-force truth over a mutable id→vector map, same float kernel and
    * (score, id) tie order the index uses. */
  private def expect(truth: mutable.Map[Long, Array[Float]],
                     qs: Array[(Long, Array[Float])], k: Int,
                     metric: KnnSearch.Metric): Seq[(Long, Seq[(Float, Long)])] =
    qs.toSeq.map { case (qid, q) =>
      val scored = truth.toSeq.map { case (id, v) => (metric.scoreF32(q, v), id) }
      val sorted =
        if (metric.descending) scored.sortBy { case (s, id) => (-s, id) }
        else scored.sortBy(identity)
      (qid, sorted.take(k))
    }

  private def got(res: Array[(Long, Array[(Float, Long)])]): Seq[(Long, Seq[(Float, Long)])] =
    res.toSeq.map { case (qid, arr) => (qid, arr.toSeq) }

  /** Scores within 1e-4 at every rank — the serving scans pick the SIMD
    * kernels when available (lane-order float reassociation) while
    * `expect` uses the scalar family, so last-ulp score drift between
    * the two is expected and harmless. An id may differ at a rank ONLY
    * inside that drift window (a legitimate near-tie swap), never on a
    * real score gap. */
  private def assertSame(actual: Seq[(Long, Seq[(Float, Long)])],
                         expected: Seq[(Long, Seq[(Float, Long)])],
                         label: String = ""): Unit = {
    assert(actual.map(_._1) === expected.map(_._1), label)
    actual.zip(expected).foreach { case ((q, a), (_, e)) =>
      assert(a.length === e.length, s"$label query $q size")
      a.zip(e).foreach { case ((sa, ia), (se, ie)) =>
        assert(math.abs(sa - se) <= 1e-4f,
          if (ia == ie) s"$label query $q id $ia: $sa vs $se"
          else s"$label query $q swap $ia vs $ie outside drift: $sa vs $se")
      }
    }
  }

  test("unmutated mutable index equals the immutable flat base") {
    val docs = baseRdd.cache(); docs.count()
    val idx = ServingIndex.mutableFlat(docs, dim)
    val flat = ServingIndex.buildFlat(docs, dim)
    for (metric <- Seq[KnnSearch.Metric](KnnSearch.L2, KnnSearch.Cosine)) {
      assert(got(idx.search(queries, 10, metric)) === got(flat.search(queries, 10, metric)))
    }
    flat.slabs.unpersist(); docs.unpersist()
  }

  test("upsert/replace/delete stream matches brute force at every step") {
    val truth = mutable.LinkedHashMap(baseRows: _*)
    val idx = ServingIndex.mutableFlat(baseRdd, dim)

    def check(label: String): Unit =
      for (metric <- Seq[KnnSearch.Metric](KnnSearch.L2, KnnSearch.Cosine)) {
        assertSame(got(idx.search(queries, 10, metric)),
          expect(truth, queries, 10, metric), s"$label / $metric")
      }

    // fresh inserts
    (1000L to 1019L).foreach { id =>
      val v = vec(5000L + id); idx.upsert(id, v); truth(id) = v
    }
    check("after inserts")
    // replacements of base ids (old copy must be masked)
    Seq(3L, 77L, 250L).foreach { id =>
      val v = vec(7000L + id); idx.upsert(id, v); truth(id) = v
    }
    check("after replace")
    // deletes from base and from delta
    Seq(0L, 77L, 1005L).foreach { id => idx.delete(id); truth.remove(id) }
    check("after delete")
    assert(idx.search(queries, 10, KnnSearch.L2).forall(_._2.length == 10),
      "k results still returned after deletes")
    // compaction folds everything into a fresh base with identical answers
    val before = got(idx.search(queries, 10, KnnSearch.L2))
    idx.compact()
    assert(idx.deltaSize === 0 && idx.tombstoneCount === 0)
    assert(got(idx.search(queries, 10, KnnSearch.L2)) === before)
    check("after compact")
  }

  test("auto-compaction keeps delta and tombstones bounded") {
    val idx = ServingIndex.mutableFlat(baseRdd, dim, maxDelta = 4, maxTombstones = 3)
    (2000L until 2012L).foreach(id => idx.upsert(id, vec(id)))
    assert(idx.deltaSize <= 4, "delta flushed by threshold")
    (0L until 8L).foreach(idx.delete)
    assert(idx.tombstoneCount <= 3, "tombstones flushed by threshold")
    // everything still correct after the automatic flushes
    val truth = mutable.LinkedHashMap(baseRows: _*)
    (2000L until 2012L).foreach(id => truth(id) = vec(id))
    (0L until 8L).foreach(truth.remove)
    assertSame(got(idx.search(queries, 10, KnnSearch.L2)),
      expect(truth, queries, 10, KnnSearch.L2))
  }

  test("streamed micro-batches maintain the index via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = ServingIndex.mutableFlat(baseRdd, dim)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Option[Array[Float]])]
    val q = graft.streaming.IndexMaintenance.maintain(
      mem.toDF().toDF("id", "vec"), idx)
    try {
      // batch 1: two inserts land and are searchable at the batch boundary
      val v1 = vec(8001L); val v2 = vec(8002L)
      mem.addData((9001L, Some(v1)), (9002L, Some(v2)))
      q.processAllAvailable()
      val truth = mutable.LinkedHashMap(baseRows: _*)
      truth(9001L) = v1; truth(9002L) = v2
      assertSame(got(idx.search(queries, 10, KnnSearch.L2)),
        expect(truth, queries, 10, KnnSearch.L2))
      // batch 2: a delete (null vec) and a replacement
      val v3 = vec(8003L)
      mem.addData((9001L, None), (42L, Some(v3)))
      q.processAllAvailable()
      truth.remove(9001L); truth(42L) = v3
      assertSame(got(idx.search(queries, 10, KnnSearch.L2)),
        expect(truth, queries, 10, KnnSearch.L2))
    } finally q.stop()
  }

  test("serving counters tally requests, queries, errors (A11)") {
    val counters = new graft.operators.ServingCounters(spark.sparkContext, "t")
    val idx = ServingIndex.mutableFlat(baseRdd, dim).withCounters(counters)
    val before = got(idx.search(queries, 10, KnnSearch.L2))
    idx.search(queries.take(3), 5, KnnSearch.L2)
    assert(counters.requestsTotal.value === 2L)
    assert(counters.queriesTotal.value === (queries.length + 3).toLong)
    assert(counters.errorsTotal.value === 0L)
    assert(counters.latencyNanosTotal.value > 0L)
    // a failing request increments errors AND still counts as a request
    // (error rate = errors/requests must see the denominator)
    intercept[Throwable] { idx.search(Array((0L, null)), 10, KnnSearch.L2) }
    assert(counters.errorsTotal.value === 1L)
    assert(counters.requestsTotal.value === 3L)
    // counters never change results
    assert(got(idx.search(queries, 10, KnnSearch.L2)) === before)
    assert(counters.render.contains("t_requests_total 4"))
  }

  test("applyBatch refuses an over-budget micro-batch (backfill guard)") {
    import spark.implicits._
    val idx = ServingIndex.mutableFlat(baseRdd, dim)
    val big = (10000L until 10010L).map(id => (id, Some(vec(id)))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.IndexMaintenance.applyBatch(big, idx, "id", "vec",
        maxBatchRows = 5L)
    }
    assert(e.getMessage.contains("maintenance budget"))
    // the refused batch must not have been partially applied
    val truth = mutable.LinkedHashMap(baseRows: _*)
    assertSame(got(idx.search(queries, 10, KnnSearch.L2)),
      expect(truth, queries, 10, KnnSearch.L2))
    // under budget the same rows apply cleanly
    graft.streaming.IndexMaintenance.applyBatch(big, idx, "id", "vec",
      maxBatchRows = 10L)
    (10000L until 10010L).foreach(id => truth(id) = vec(id))
    assertSame(got(idx.search(queries, 10, KnnSearch.L2)),
      expect(truth, queries, 10, KnnSearch.L2))
  }

  test("insert-only workload adds no tombstones (no over-fetch inflation)") {
    val idx = ServingIndex.mutableFlat(baseRdd, dim, maxTombstones = 50)
    // 100 fresh ids: with unconditional tombstoning this would blow past
    // maxTombstones=50 and force spurious full rebuilds; the Bloom gate on
    // base membership must keep the tombstone set empty
    (5000L until 5100L).foreach(id => idx.upsert(id, vec(id)))
    // the Bloom gate is allowed rare false positives (each adds one
    // harmless tombstone) — what must NOT happen is the pre-fix behavior
    // of one tombstone per insert (100 here)
    assert(idx.tombstoneCount <= 3, s"got ${idx.tombstoneCount} tombstones")
    // deleting an id that never existed must not (modulo the same rare
    // false positive) tombstone either
    idx.delete(999999L)
    assert(idx.tombstoneCount <= 4)
  }

  test("IVF compaction survives the live set shrinking below nlist") {
    val idx = ServingIndex.mutableIvf(baseRdd, dim, nlist = 16, iterations = 3,
      maxTombstones = 1000)
    (0L until (n - 5).toLong).foreach(idx.delete)
    idx.compact() // 5 survivors < nlist=16: rebuild must clamp, not wedge
    assert(idx.deltaSize === 0 && idx.tombstoneCount === 0)
    val truth = mutable.LinkedHashMap(baseRows.drop(n - 5): _*)
    assertSame(got(idx.search(queries, 10, KnnSearch.L2, nprobe = 16)),
      expect(truth, queries, 10, KnnSearch.L2))
    // all the way to empty: degrades to a flat base, returns no rows
    (0L until n.toLong).foreach(idx.delete)
    idx.compact()
    assert(idx.search(queries, 3, KnnSearch.L2).forall(_._2.isEmpty))
    // and the index still accepts writes afterwards
    idx.upsert(7L, vec(7L))
    assert(idx.search(queries, 1, KnnSearch.L2).forall(_._2.map(_._2).sameElements(Array(7L))))
  }

  test("compaction cuts lineage: DAG depth stays flat across many flushes") {
    val idx = ServingIndex.mutableFlat(baseRdd, dim)
    idx.upsert(6000L, vec(6000L)); idx.compact()
    val depthAfterFirst = idx.lineageDepth
    (1 to 5).foreach { g => idx.upsert(6000L + g, vec(6000L + g)); idx.compact() }
    assert(idx.lineageDepth <= depthAfterFirst,
      s"lineage grew: ${idx.lineageDepth} vs $depthAfterFirst after 5 more flushes")
  }

  test("insert-bearing compactions keep the slab count flat (flat and IVF)") {
    // each compact() unions the delta as one extra partition; the rebuild
    // must coalesce back to the base's slab count or tasks-per-search and
    // the driver merge grow one slab per flush forever
    val flat = ServingIndex.mutableFlat(baseRdd, dim)
    val ivf = ServingIndex.mutableIvf(baseRdd, dim, nlist = 8, iterations = 3)
    val flatSlabs0 = flat.slabCount
    val ivfSlabs0 = ivf.slabCount
    (1 to 5).foreach { g =>
      flat.upsert(7000L + g, vec(7000L + g)); flat.compact()
      ivf.upsert(7000L + g, vec(7000L + g)); ivf.compact()
    }
    assert(flat.slabCount === flatSlabs0,
      s"flat slabs grew ${flatSlabs0} -> ${flat.slabCount} over 5 flushes")
    assert(ivf.slabCount === ivfSlabs0,
      s"ivf slabs grew ${ivfSlabs0} -> ${ivf.slabCount} over 5 flushes")
    // and answers are still right
    val truth = mutable.LinkedHashMap(baseRows: _*)
    (1 to 5).foreach(g => truth(7000L + g) = vec(7000L + g))
    assertSame(got(flat.search(queries, 10, KnnSearch.L2)),
      expect(truth, queries, 10, KnnSearch.L2))
    assertSame(got(ivf.search(queries, 10, KnnSearch.L2, nprobe = 8)),
      expect(truth, queries, 10, KnnSearch.L2))
  }

  test("k = 0 returns empty results instead of throwing") {
    val idx = ServingIndex.mutableFlat(baseRdd, dim)
    assert(idx.search(queries, 0, KnnSearch.L2).forall(_._2.isEmpty))
    val flat = ServingIndex.buildFlat(baseRdd, dim)
    assert(flat.search(queries, 0, KnnSearch.Cosine).forall(_._2.isEmpty))
    flat.slabs.unpersist()
  }

  test("array<double> vector streams are cast, not crashed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = ServingIndex.mutableFlat(baseRdd, dim)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Option[Array[Double]])]
    val q = graft.streaming.IndexMaintenance.maintain(
      mem.toDF().toDF("id", "vec"), idx)
    try {
      val v = vec(8100L)
      mem.addData((9100L, Some(v.map(_.toDouble))), (3L, None))
      q.processAllAvailable()
      val truth = mutable.LinkedHashMap(baseRows: _*)
      truth(9100L) = v; truth.remove(3L)
      assertSame(got(idx.search(queries, 10, KnnSearch.L2)),
        expect(truth, queries, 10, KnnSearch.L2))
    } finally q.stop()
  }

  test("mutable SQ8: delta is exact, deletes mask, delete-only compaction is lossless") {
    val idx = ServingIndex.mutableSq8(baseRdd, dim)
    val sq8 = ServingIndex.buildSq8(baseRdd, dim)
    // unmutated: identical to the immutable quantized tier
    assert(got(idx.search(queries, 10, KnnSearch.L2)) ===
      got(sq8.search(queries, 10, KnnSearch.L2)))
    sq8.slabs.unpersist()
    // a fresh upsert lives in the float delta: searching for the exact
    // vector must return it at distance 0 (no quantization on the memtable)
    val probe = vec(123456L)
    idx.upsert(424242L, probe)
    val hit = idx.search(Array((0L, probe)), 1, KnnSearch.L2).head._2.head
    assert(hit._2 === 424242L && hit._1 === 0f)
    idx.delete(424242L)
    // delete-only compaction: surviving codes re-encode under the frozen
    // quantizer — results must be bit-identical before and after
    Seq(1L, 2L, 3L).foreach(idx.delete)
    val before = got(idx.search(queries, 10, KnnSearch.L2))
    idx.compact()
    assert(idx.deltaSize === 0 && idx.tombstoneCount === 0)
    assert(got(idx.search(queries, 10, KnnSearch.L2)) === before)
  }

  test("mutable SQ8/IvfSq8: mutation stream keeps high recall vs float truth") {
    val truth = mutable.LinkedHashMap(baseRows: _*)
    val sq8 = ServingIndex.mutableSq8(baseRdd, dim)
    val ivfsq = ServingIndex.mutableIvfSq8(baseRdd, dim, nlist = 8, iterations = 5)
    (4000L to 4019L).foreach { id =>
      val v = vec(id); sq8.upsert(id, v); ivfsq.upsert(id, v); truth(id) = v
    }
    Seq(0L, 7L, 4005L).foreach { id =>
      sq8.delete(id); ivfsq.delete(id); truth.remove(id)
    }
    def recall(res: Array[(Long, Array[(Float, Long)])]): Double = {
      val exact = expect(truth, queries, 10, KnnSearch.L2)
        .map { case (qid, hits) => qid -> hits.map(_._2).toSet }.toMap
      val fracs = res.map { case (qid, hits) =>
        hits.map(_._2).count(exact(qid)) / 10.0
      }
      fracs.sum / fracs.length
    }
    assert(recall(sq8.search(queries, 10, KnnSearch.L2)) >= 0.9)
    assert(recall(ivfsq.search(queries, 10, KnnSearch.L2, nprobe = 8)) >= 0.9)
    // compaction folds the delta through the frozen quantizer: recall
    // holds, state drains, slab count stays flat
    val slabs0 = ivfsq.slabCount
    sq8.compact(); ivfsq.compact()
    assert(sq8.deltaSize === 0 && ivfsq.tombstoneCount === 0)
    assert(ivfsq.slabCount === slabs0)
    assert(recall(sq8.search(queries, 10, KnnSearch.L2)) >= 0.9)
    assert(recall(ivfsq.search(queries, 10, KnnSearch.L2, nprobe = 8)) >= 0.9)
    // deleted ids never resurface after the rebuild
    val gone = Set(0L, 7L, 4005L)
    assert(sq8.search(queries, 10, KnnSearch.L2)
      .forall(_._2.forall(h => !gone(h._2))))
  }

  test("mutable IVF at nprobe = nlist agrees with mutable flat") {
    val flat = ServingIndex.mutableFlat(baseRdd, dim)
    val ivf = ServingIndex.mutableIvf(baseRdd, dim, nlist = 8, iterations = 5)
    Seq(5L, 9L).foreach(id => { flat.delete(id); ivf.delete(id) })
    (3000L to 3009L).foreach { id =>
      val v = vec(id); flat.upsert(id, v); ivf.upsert(id, v)
    }
    val a = got(flat.search(queries, 10, KnnSearch.L2))
    val b = got(ivf.search(queries, 10, KnnSearch.L2, nprobe = 8))
    assert(a === b)
    ivf.compact()
    assert(got(ivf.search(queries, 10, KnnSearch.L2, nprobe = 8)) === a)
  }
}
