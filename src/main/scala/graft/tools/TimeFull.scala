package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Like [[TimeQuery]] but forces FULL evaluation of every output column:
 * `.count()` lets Catalyst prune unreferenced columns (a rebuild UDF, a
 * left-join payload), so a count-timed query can under-report the real
 * materialization cost. This timer folds every column through xxhash64
 * into one aggregate — nothing can be pruned, nothing is collected.
 * Measurement protocol: [[Timing]] (trimmed mean of 5, spread published).
 * `runMain graft.tools.TimeFull <sfDir> <qname> [qname...]`
 */
object TimeFull {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      Timing.report(n) {
        val df = q(spark, dir)
        df.agg(bit_xor(xxhash64(df.columns.map(c => col(c).cast("string")): _*))).head()
      }
    }
    spark.stop()
  }
}
