package graft

import graft.streaming.ArchiveDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The streaming daily-ingest loop (ArchiveDedup): every micro-batch
 * dedups against the latest persisted index snapshot, emits pairs
 * idempotently, and folds itself in so LATER batches see it — gated
 * here both through the batch function directly (replay semantics
 * included) and through a real MemoryStream → foreachBatch run.
 */
class ArchiveDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tA = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val tB = "structured streaming state stores hold horizon bounded claims across micro batches"
  private val tC = "completely different subject matter entirely about spark catalyst optimizer rules"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def pairsOf(dir: String): Set[(Long, Long, Long)] =
    spark.read.option("basePath", dir).parquet(dir)
      .select(col("id_a"), col("id_b"), col("batch_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("batches dedup against the archive, fold in, and replay idempotently") {
    val archive = tmp("graft-arch")
    val pairsDir = tmp("graft-arch-pairs")
    val day0 = Seq((0L, tA), (1L, tA), (2L, tC)).toDF("doc_id", "text")
    ArchiveDedup.seedArchive(day0, archive, "doc_id", "text")

    val batch1 = Seq((10L, tA), (11L, tB)).toDF("doc_id", "text")
    ArchiveDedup.processBatch(batch1, 0L, archive, pairsDir, "doc_id", "text", 0.5)
    val after1 = pairsOf(pairsDir)
    assert(after1.contains((0L, 10L, 0L)) && after1.contains((1L, 10L, 0L)),
      s"batch 1 must pair with the day-0 archive: $after1")
    assert(!after1.exists(p => p._1 == 0L && p._2 == 1L),
      "old×old must never re-emit")

    // batch 2 pairs with BOTH the day-0 archive and the folded batch 1
    val batch2 = Seq((20L, tB), (21L, tA)).toDF("doc_id", "text")
    ArchiveDedup.processBatch(batch2, 1L, archive, pairsDir, "doc_id", "text", 0.5)
    val after2 = pairsOf(pairsDir)
    assert(after2.contains((11L, 20L, 1L)),
      s"batch 2 must see folded batch 1 as archive side: $after2")
    assert(after2.contains((0L, 21L, 1L)) && after2.contains((10L, 21L, 1L)),
      s"batch 2 must see day 0 AND batch 1: $after2")
    assert(!after2.exists(p => p._1 == 10L && p._2 == 11L && p._3 == 1L),
      "batch-1 internal pairs are old×old for batch 2")

    // replayed micro-batch (same batchId): both effects already durable
    ArchiveDedup.processBatch(batch1, 0L, archive, pairsDir, "doc_id", "text", 0.5)
    assert(pairsOf(pairsDir) === after2, "replay must be a no-op")
    val (latest, v) = ArchiveDedup.loadLatest(spark, archive)
    assert(v === 1L)
    assert(latest.sets.count() === 7L, "archive holds day 0 + both batches exactly once")

    // compaction folds slivers into a fresh base; reads are equivalent
    val compacted = tmp("graft-arch-c")
    ArchiveDedup.compactArchive(spark, archive, compacted)
    val (cIx, cv) = ArchiveDedup.loadLatest(spark, compacted)
    assert(cv === -1L, "compacted archive has no slivers")
    def keySet(ix: graft.operators.Dedup.MinhashIndex) =
      ix.buckets.select(col("bkt"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keySet(cIx) === keySet(latest))
    assert(cIx.sets.count() === 7L)
  }

  test("cosine twin: embedding batches dedup against the archive, fold in, replay idempotently") {
    def vec(seedBase: Int): Array[Float] = {
      val r = new java.util.Random(7L * seedBase)
      Array.fill(16)(r.nextGaussian().toFloat)
    }
    val a = vec(1); val b = vec(2); val c = vec(3)
    val archive = tmp("graft-carch")
    val pairsDir = tmp("graft-carch-pairs")
    ArchiveDedup.seedCosineArchive(
      Seq((0L, a), (1L, a), (2L, c)).toDF("vec_id", "embedding"),
      archive, "vec_id", "embedding", numBits = 4, bands = 4)
    // exactLimit = 0 exercises the LSH delta tier through the stream path
    val batch1 = Seq((10L, a), (11L, b)).toDF("vec_id", "embedding")
    ArchiveDedup.processCosineBatch(batch1, 0L, archive, pairsDir,
      "vec_id", "embedding", 0.95, exactLimit = 0L)
    val after1 = pairsOf(pairsDir).map(p => (p._1, p._2))
    assert(after1.contains((0L, 10L)) && after1.contains((1L, 10L)),
      s"batch 1 vs seed: $after1")
    assert(!after1.contains((0L, 1L)), "old×old never re-emits")
    val batch2 = Seq((20L, b)).toDF("vec_id", "embedding")
    ArchiveDedup.processCosineBatch(batch2, 1L, archive, pairsDir,
      "vec_id", "embedding", 0.95, exactLimit = 0L)
    val after2 = pairsOf(pairsDir).map(p => (p._1, p._2))
    assert(after2.contains((11L, 20L)), s"batch 2 must see folded batch 1: $after2")
    // replay is a no-op
    ArchiveDedup.processCosineBatch(batch1, 0L, archive, pairsDir,
      "vec_id", "embedding", 0.95, exactLimit = 0L)
    assert(pairsOf(pairsDir).map(p => (p._1, p._2)) === after2)
    val (live, v) = ArchiveDedup.loadLatestCosine(spark, archive)
    assert(v === 1L && live.vecs.count() === 6L)
  }

  test("end-to-end through a MemoryStream foreachBatch sink") {
    val archive = tmp("graft-arch-s")
    val pairsDir = tmp("graft-arch-s-pairs")
    ArchiveDedup.seedArchive(
      Seq((0L, tA), (1L, tC)).toDF("doc_id", "text"), archive, "doc_id", "text")
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = ArchiveDedup.archiveDedupSink(
      mem.toDS().toDF("doc_id", "text"), archive, pairsDir, "doc_id", "text", 0.5)
    try {
      mem.addData((10L, tA))
      q.processAllAvailable()
      mem.addData((20L, tA), (21L, tB))
      q.processAllAvailable()
      val got = pairsOf(pairsDir).map(p => (p._1, p._2))
      assert(got.contains((0L, 10L)), s"stream batch 1 vs seed: $got")
      assert(got.contains((10L, 20L)) && got.contains((0L, 20L)),
        s"stream batch 2 vs seed + folded batch 1: $got")
      val (_, v) = ArchiveDedup.loadLatest(spark, archive)
      assert(v >= 1L)
    } finally q.stop()
  }
}
