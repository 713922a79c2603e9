package graft

import graft.operators.{CorpusStats, QualityFilters}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Incremental corpus statistics (CorpusStats): build + append must
 * equal one batch pass bit-for-bit — df and bigram counts are additive
 * over disjoint doc sets, vocabulary dedups at use time — and the
 * save/load round trip and the disjointness guard carry the dedup
 * index family's contracts. (The oracle-scale gates are q91/q92,
 * which replay q73/q79's SQL through this path.)
 */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta alpha gamma"),
    (1L, "beta gamma delta"),
    (2L, "alpha epsilon zeta eta theta"),
    (3L, "beta beta gamma alpha"),
    (4L, "iota kappa alpha"),
    (5L, "gamma delta epsilon beta")
  ).toDF("doc_id", "text")

  private def rowsOf(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("token-df: build + append == one batch pass, bit-for-bit") {
    val ix0 = CorpusStats.buildTokenStats(docs.where(col("doc_id") < 3), "doc_id", "text")
    val ix1 = CorpusStats.appendToTokenStats(ix0,
      docs.where(col("doc_id") >= 3), "doc_id", "text")
    val incr = CorpusStats.tokenFrequencyMetricsAgainst(ix1, docs, "doc_id", "text")
    val batch = QualityFilters.tokenFrequencyMetrics(docs, "doc_id", "text")
    assert(incr.columns.toSeq === batch.columns.toSeq)
    assert(rowsOf(incr) === rowsOf(batch))
    // the daily regime: score ONLY the delta against cumulative stats —
    // rows equal the batch operator's restricted to the delta's docs
    val deltaOnly = CorpusStats.tokenFrequencyMetricsAgainst(ix1,
      docs.where(col("doc_id") >= 3), "doc_id", "text")
    assert(rowsOf(deltaOnly) === rowsOf(batch.where(col("doc_id") >= 3)))
  }

  test("bigram-LM: build + append == one batch pass; vocabulary dedups at use time") {
    val ix0 = CorpusStats.buildNgramStats(docs.where(col("doc_id") < 3), "doc_id", "text")
    val ix1 = CorpusStats.appendToNgramStats(ix0,
      docs.where(col("doc_id") >= 3), "doc_id", "text")
    val incr = CorpusStats.bigramCountsAgainst(ix1, docs, "doc_id", "text")
    val batch = QualityFilters.bigramCounts(docs, "doc_id", "text")
    assert(incr.columns.toSeq === batch.columns.toSeq)
    assert(rowsOf(incr) === rowsOf(batch))
    // "alpha"/"beta"/"gamma" appear in BOTH splits: a vocabulary that
    // double-counted across batches would inflate vocab_size
    val vocab = incr.select(col("vocab_size")).head().getLong(0)
    assert(vocab === 10L, s"vocabulary must dedup across folded batches: $vocab")
  }

  test("save/load round trip preserves both indexes exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cstats").toString
    val tix = CorpusStats.buildTokenStats(docs.where(col("doc_id") < 3), "doc_id", "text")
    CorpusStats.saveTokenStats(
      CorpusStats.appendToTokenStats(tix, docs.where(col("doc_id") >= 3), "doc_id", "text"),
      s"$dir/tok")
    val tLoaded = CorpusStats.loadTokenStats(spark, s"$dir/tok")
    assert(rowsOf(CorpusStats.tokenDf(tLoaded)) ===
      rowsOf(CorpusStats.tokenDf(
        CorpusStats.buildTokenStats(docs, "doc_id", "text"))))

    val nix = CorpusStats.buildNgramStats(docs, "doc_id", "text")
    CorpusStats.saveNgramStats(nix, s"$dir/ngram")
    val nLoaded = CorpusStats.loadNgramStats(spark, s"$dir/ngram")
    assert(rowsOf(CorpusStats.bigramCountsAgainst(nLoaded, docs, "doc_id", "text")) ===
      rowsOf(QualityFilters.bigramCounts(docs, "doc_id", "text")))
  }

  test("streaming twin: archive partials per batch, replay-safe, equal to the batch operator") {
    import graft.operators.CorpusStats._
    val dir = java.nio.file.Files.createTempDirectory("graft-cstats-s").toString
    seedTokenStatsArchive(docs.where(col("doc_id") < 2), dir, "doc_id", "text")
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val rows = docs.where(col("doc_id") >= 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val q = tokenStatsSink(mem.toDS().toDF("doc_id", "text"), dir, "doc_id", "text")
    try {
      mem.addData(rows.take(2).toSeq: _*); q.processAllAvailable()
      mem.addData(rows.drop(2).toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = loadTokenStatsArchive(spark, dir)
    val batch = QualityFilters.tokenFrequencyMetrics(docs, "doc_id", "text")
    assert(rowsOf(tokenFrequencyMetricsAgainst(streamed, docs, "doc_id", "text"))
      === rowsOf(batch), "streamed archive must equal the one-shot statistics")
    // replay: same batchId + same rows skips; committed id set unchanged
    processTokenStatsBatch(docs.where(col("doc_id") >= 2 && col("doc_id") < 4),
      0L, dir, "doc_id", "text")
    assert(loadTokenStatsArchive(spark, dir).ids.count() === 6L)
    // restart WITHOUT checkpoint (same batchId, fresh ids): refuse at commit
    val ex = intercept[IllegalStateException] {
      processTokenStatsBatch(
        Seq((99L, "omega psi")).toDF("doc_id", "text"), 0L, dir, "doc_id", "text")
    }
    assert(ex.getMessage.contains("checkpointLocation"))
    // a PARTIAL id overlap can only be corruption — refuse loudly
    val ex2 = intercept[IllegalStateException] {
      processTokenStatsBatch(
        Seq((2L, "seen"), (999L, "fresh")).toDF("doc_id", "text"),
        9L, dir, "doc_id", "text")
    }
    assert(ex2.getMessage.contains("partial fold"), ex2.getMessage)
    // compaction folds entries; reads equivalent, and a replay of a
    // batch whose ENTRY was folded away still skips (id-membership
    // coverage, not entry presence)
    val dst = java.nio.file.Files.createTempDirectory("graft-cstats-c").toString
    compactTokenStatsArchive(spark, dir, dst)
    assert(rowsOf(CorpusStats.tokenDf(loadTokenStatsArchive(spark, dst)))
      === rowsOf(CorpusStats.tokenDf(streamed)))
    processTokenStatsBatch(docs.where(col("doc_id") >= 2 && col("doc_id") < 4),
      0L, dst, "doc_id", "text")
    assert(loadTokenStatsArchive(spark, dst).ids.count() === 6L,
      "compacted-away batch must replay as a skip, never a double-count")
  }

  test("ngram streaming twin: streamed archive equals the one-shot model, replay-safe") {
    import graft.operators.CorpusStats._
    val dir = java.nio.file.Files.createTempDirectory("graft-cstats-ns").toString
    seedNgramStatsArchive(docs.where(col("doc_id") < 2), dir, "doc_id", "text")
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val rows = docs.where(col("doc_id") >= 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val q = ngramStatsSink(mem.toDS().toDF("doc_id", "text"), dir, "doc_id", "text")
    try {
      mem.addData(rows.take(2).toSeq: _*); q.processAllAvailable()
      mem.addData(rows.drop(2).toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = loadNgramStatsArchive(spark, dir)
    assert(rowsOf(bigramCountsAgainst(streamed, docs, "doc_id", "text"))
      === rowsOf(QualityFilters.bigramCounts(docs, "doc_id", "text")),
      "streamed ngram archive must equal the one-shot model")
    // replay skips; counter reset refuses
    processNgramStatsBatch(docs.where(col("doc_id") >= 2 && col("doc_id") < 4),
      0L, dir, "doc_id", "text")
    assert(loadNgramStatsArchive(spark, dir).ids.count() === 6L)
    val ex = intercept[IllegalStateException] {
      processNgramStatsBatch(
        Seq((77L, "chi phi")).toDF("doc_id", "text"), 0L, dir, "doc_id", "text")
    }
    assert(ex.getMessage.contains("checkpointLocation"))
  }

  test("delta disjointness is enforced loudly on both families") {
    val ix = CorpusStats.buildTokenStats(docs.where(col("doc_id") < 3), "doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      CorpusStats.appendToTokenStats(ix, docs.where(col("doc_id") < 2), "doc_id", "text")
    }
    assert(ex.getMessage.contains("appendToTokenStats"))
    val nx = CorpusStats.buildNgramStats(docs.where(col("doc_id") < 3), "doc_id", "text")
    val ex2 = intercept[IllegalArgumentException] {
      CorpusStats.appendToNgramStats(nx, docs.where(col("doc_id") === 1L), "doc_id", "text")
    }
    assert(ex2.getMessage.contains("appendToNgramStats"))
  }
}
