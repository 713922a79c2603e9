package graft.tools

import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` output of SparkEntry queries to files
  * (the r20 optimization-evidence protocol: every touched query ships a
  * plans/rNN/<query>_{before,after}.txt pair the judge can diff):
  * `runMain graft.tools.PlanDumpFmt <sfDir> <outDir> <suffix> [qname...]`.
  * The session mirrors the bench's configuration (32 slots, 32 shuffle
  * partitions, AQE on, Kryo) so the dumped plan is the plan the bench
  * actually runs — modulo AQE's runtime re-optimization, which explain
  * shows as `AdaptiveSparkPlan isFinalPlan=false`. */
object PlanDumpFmt {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val suffix = args(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    // GRAFT_PLANDUMP_EXEC=1: execute the frame's own QueryExecution
    // first (collect — a noop write would plan a SEPARATE execution)
    // so the dump shows the FINAL adaptive plan: AQE-reused stages
    // (the r20 stage-sharing claims) are runtime artifacts invisible
    // in the initial `isFinalPlan=false` plan
    val exec = sys.env.get("GRAFT_PLANDUMP_EXEC").exists(_.trim == "1")
    args.drop(3).foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      if (exec) df.collect()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out/${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $out/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
