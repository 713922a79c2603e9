package graft

import graft.streaming.EventStream
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MinHash near-dup filter: LSH bucket claims with
  * first-arrival-wins semantics, horizon-bounded state, batch parity
  * with Dedup.minhashLshPairs' candidate generation. */
class StreamingNearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val MS = 1000L

  // near-identical pair (one token changed) + an unrelated doc, long
  // enough that 3-gram shingle sets overlap heavily
  private val docA = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val docB = "the quick brown fox jumps over the lazy dog near the quiet river bank tonight"
  private val docC = "completely different subject matter entirely about spark structured streaming state"

  private def runStream(batches: Seq[Seq[(Long, String, Long)]],
                        horizonMs: Long = 3600000L): Seq[Set[Long]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val src = mem.toDS().toDF("doc_id", "text", "ts_ms")
      .withColumn("event_time", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("ts_ms")))
    val verdicts = EventStream.nearDupBandVerdicts(
      src, "doc_id", "text", "event_time", numHashes = 16, bands = 4,
      shingleLen = 3, horizonMs = horizonMs)
    val kept = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = verdicts.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ids = EventStream.keptOf(batch).collect().map(_.getLong(0)).toSet
        kept.synchronized { kept += ids }
        ()
      }
      .start()
    try {
      batches.foreach { b =>
        mem.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    // drop empty flush batches the engine may schedule
    kept.toSeq.filter(_.nonEmpty)
  }

  test("near-dup arriving in a later batch is dropped; distinct docs are kept") {
    val B = 100000L * MS
    val out = runStream(Seq(
      Seq((1L, docA, B)),
      Seq((2L, docB, B + 60L * MS), (3L, docC, B + 60L * MS))))
    assert(out.head === Set(1L))
    // doc 2 collides with doc 1's buckets in every band → dropped;
    // doc 3 shares no shingles → kept
    assert(out(1) === Set(3L))
  }

  test("same-batch near-dup pair: first arrival wins, the other is dropped") {
    val B = 100000L * MS
    val out = runStream(Seq(
      Seq((2L, docB, B + 10L * MS), (1L, docA, B), (3L, docC, B))))
    // doc 1 has the earlier event time → claims the buckets; 2 collides
    assert(out.head === Set(1L, 3L))
  }

  test("claim expires past the horizon: the same text is re-admitted") {
    val B = 100000L * MS
    val horizon = 1000L * MS
    val out = runStream(Seq(
      Seq((1L, docA, B)),
      // sentinel far in the future pushes the watermark past B + horizon
      Seq((9L, docC, B + 100000L * MS)),
      // same text as doc 1, inside the new window: bucket claim expired
      Seq((4L, docA, B + 101000L * MS))), horizonMs = horizon)
    assert(out.head === Set(1L))
    assert(out(1) === Set(9L))
    assert(out(2) === Set(4L), "expired claim must not suppress re-arrival")
  }

  test("state store stays horizon-bounded under a continuous feed") {
    // 16 batches of fresh docs, event time advancing horizon/2 per
    // batch: claims expire once the watermark (max event − horizon)
    // passes claim + horizon, i.e. ~4 batches after arrival — so
    // steady-state state rows are ~4 batches' worth of bucket claims
    // (≤ bands × docs), NOT the whole feed's. An unbounded-state
    // regression (expiry never firing) would hold every claim ever:
    // bands × docsPerBatch × 16.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bands = 4
    val docsPerBatch = 100
    val horizon = 1000L * MS
    val t0 = 1000000L * MS
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val src = mem.toDS().toDF("doc_id", "text", "ts_ms")
      .withColumn("event_time", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("ts_ms")))
    val verdicts = EventStream.nearDupBandVerdicts(
      src, "doc_id", "text", "event_time", numHashes = 16, bands = bands,
      shingleLen = 3, horizonMs = horizon)
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = verdicts.toDF().writeStream.outputMode("append")
      .format("noop").start()
    try {
      (0 until 16).foreach { b =>
        val ts = t0 + b * horizon / 2
        mem.addData((0 until docsPerBatch).map { i =>
          val id = b * 1000L + i
          // distinct text per doc: no cross-claims needed, every doc
          // claims its own buckets — the worst case for state growth
          (id, s"unique document number $id with payload words " +
            s"alpha$id beta$id gamma$id delta$id epsilon$id zeta$id eta$id theta$id", ts)
        })
        q.processAllAvailable()
        Option(q.lastProgress).foreach { p =>
          if (p.stateOperators.nonEmpty)
            stateRows += p.stateOperators.apply(0).numRowsTotal
        }
      }
    } finally q.stop()
    assert(stateRows.nonEmpty)
    val steady = stateRows.takeRight(4)
    val unboundedWouldBe = bands.toLong * docsPerBatch * 16
    // bound: ~4 in-horizon batches of claims + generous slack, far
    // below the every-claim-ever count
    assert(steady.max <= bands.toLong * docsPerBatch * 6,
      s"state grew past the horizon bound: $stateRows")
    assert(steady.max < unboundedWouldBe / 2,
      s"state looks unbounded (${steady.max} of $unboundedWouldBe claims retained): $stateRows")
    // and it must actually PLATEAU: the last reading is no bigger than
    // the mid-stream peak plus slack (monotone growth = leak)
    val mid = stateRows.slice(6, 12)
    assert(stateRows.last <= mid.max * 3 / 2 + bands * docsPerBatch,
      s"state still climbing at end of feed: $stateRows")
  }

  test("streaming banding is identical to the batch operator's") {
    // the stream flags (A, B) as near-dups because they collide in a
    // band; the batch candidate generator must agree on those buckets
    import spark.implicits._
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val batchPairs = graft.operators.Dedup.minhashLshPairs(
        df, "doc_id", "text", numHashes = 16, bands = 4,
        shingleLen = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs === Set((1L, 2L)))
  }
}
