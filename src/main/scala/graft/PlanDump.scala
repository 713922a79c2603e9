package graft

/** Print physical plans for SparkEntry queries (PLANS.md evidence).
  * Usage: runMain graft.PlanDump <sfDir> [qname ...] — no args = all. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = Graft.session("local[8]", shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("simple")
    }
    spark.stop()
  }
}
