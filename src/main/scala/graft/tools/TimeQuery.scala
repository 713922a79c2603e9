package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Ad-hoc single-query timer for scale experiments:
 * `runMain graft.tools.TimeQuery <sfDir> <qname> [qname...]` runs each
 * named [[graft.SparkEntry.queries]] entry against the dir (one warm-up +
 * 3 timed runs, median reported) so a plan change can be held to the
 * "sf1 ≲ 2 s" bar without running the whole bench.
 */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val cnt = q(spark, dir).count()
        (cnt, (System.nanoTime() - t0) / 1e9)
      }
      val warm = once()
      val timed = Seq.fill(3)(once()._2).sorted
      println(f"$n%s rows=${warm._1}%d warm=${warm._2}%.3f median=${timed(1)}%.3f runs=${timed.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
