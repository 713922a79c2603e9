package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-job trace of a SparkEntry query: one line per job (description +
  * task count) — locates WHICH driver round-trips a lifecycle query
  * pays, where QueryJobs only counts them.
  * `runMain graft.tools.JobTrace <sfDir> <qname> [reps]` */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var trace = false
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (trace) {
            val desc = j.stageInfos.map(s => s.name.takeWhile(_ != '\n'))
              .mkString(" | ")
            lines.add(f"job ${j.jobId}%4d stages=${j.stageInfos.size} " +
              f"tasks=${j.stageInfos.map(_.numTasks).sum}%4d  $desc")
          }
      })
    val q = graft.SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      lines.clear()
      trace = r == reps
      val t0 = System.nanoTime()
      val n = q(spark, dir).collect().length
      println(f"[$r] ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    Thread.sleep(500)
    lines.forEach(l => println(l))
    spark.stop()
  }
}
