package graft.tools

import graft.operators.{CorpusStats, QualityFilters}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale measurement for the incremental corpus-statistics indexes
 * (`runMain graft.tools.StatsScale <dir>`): the daily refresh decision
 * — re-run the batch statistics over (corpus ∪ delta), or fold the
 * delta into a persisted [[CorpusStats]] index and score against it.
 * 90% of the documents table seeds the index (one-time, persisted);
 * the remaining 10% arrives as the delta. Measured per family:
 * (a) full batch recompute over the union — the rebuild price;
 * (b) append the delta to the LOADED index + score the delta against
 *     it — the incremental price (tokenizes the delta only; the
 *     archive contributes compact count partials).
 */
object StatsScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val seed = docs.where(col("doc_id") % 10 =!= 0)
    val delta = docs.where(col("doc_id") % 10 === 0)
    println(s"corpus ${docs.count()} docs; seed ${seed.count()}, delta ${delta.count()}")

    def timed(name: String)(fn: => Long): Unit = {
      fn // warm (JIT + file listing)
      val t0 = System.nanoTime()
      val n = fn
      println(f"$name%-58s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val tmp = java.nio.file.Files.createTempDirectory("graft-stats-scale").toString
    // one-time seed builds, persisted (the artifact a pipeline reuses)
    CorpusStats.saveTokenStats(
      CorpusStats.buildTokenStats(seed, "doc_id", "text"), s"$tmp/tok")
    CorpusStats.saveNgramStats(
      CorpusStats.buildNgramStats(seed, "doc_id", "text"), s"$tmp/ngram")

    timed("token-df: FULL batch recompute over corpus ∪ delta") {
      QualityFilters.tokenFrequencyMetrics(docs, "doc_id", "text").count()
    }
    timed("token-df: append delta to loaded index + score delta") {
      val ix = CorpusStats.appendToTokenStats(
        CorpusStats.loadTokenStats(spark, s"$tmp/tok"), delta, "doc_id", "text")
      CorpusStats.tokenFrequencyMetricsAgainst(ix, delta, "doc_id", "text").count()
    }
    timed("bigram-LM: FULL batch recompute over corpus ∪ delta") {
      QualityFilters.bigramCounts(docs, "doc_id", "text").count()
    }
    timed("bigram-LM: append delta to loaded index + score delta") {
      val ix = CorpusStats.appendToNgramStats(
        CorpusStats.loadNgramStats(spark, s"$tmp/ngram"), delta, "doc_id", "text")
      CorpusStats.bigramCountsAgainst(ix, delta, "doc_id", "text").count()
    }
    spark.stop()
  }
}
