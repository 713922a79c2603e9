package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Ad-hoc single-query timer for scale experiments:
 * `runMain graft.tools.TimeQuery <sfDir> <qname> [qname...]` runs each
 * named [[graft.SparkEntry.queries]] entry against the dir with the
 * trimmed-mean protocol (see [[Timing.report]]) so a plan change can be
 * held to the "sf1 ≲ 2 s" bar without running the whole bench.
 */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // A/B-able serializer (SPARK_GRAFT_SERIALIZER), default Kryo like
      // the production sessions
      .config("spark.serializer", sys.env.getOrElse("SPARK_GRAFT_SERIALIZER",
        "org.apache.spark.serializer.KryoSerializer"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_STAGE_CACHE=false measures every query's FULL cost
    // (shared pair frames recomputed per run) instead of the session's
    // amortized cost — the build-wall lines below publish the one-time
    // stage costs either way
    sys.env.get("SPARK_GRAFT_STAGE_CACHE").foreach(v =>
      spark.conf.set("spark.graft.stageCache.enabled", v))
    // arbitrary session confs for A/B probes: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      var rows = -1L
      Timing.report(n, extra = () => s"rows=$rows") {
        rows = q(spark, dir).count()
      }
    }
    graft.SparkEntry.artifactBuildSeconds.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"$k%s build=$v%.3f")
    }
    spark.stop()
  }
}

/**
 * Shared measurement protocol for the scale timers: one discarded
 * warm-up, then FIVE timed runs, reporting the TRIMMED MEAN (drop min
 * and max, average the middle three) plus the full per-run list and the
 * relative spread (max−min)/mean.
 *
 * Round 8's ×100 tables used warm median-of-3 and showed run-to-run
 * variance up to ±40% on >10 s queries (GC pauses, page-cache state,
 * sibling-tenant noise) — too wide to attribute a single-round delta.
 * The trimmed mean of 5 keeps the robustness of the median (one bad run
 * cannot move it) while averaging out the residual two-run jitter, and
 * publishing the spread makes any still-noisy row self-labeling instead
 * of silently authoritative.
 */
object Timing {
  /** (trimmedMean, runs) of five timed executions after one warm-up. */
  def measure(fn: => Unit): (Double, Array[Double]) = {
    fn // warm-up (codegen, file listing, JIT) — discarded
    val runs = Array.fill(5) {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }
    val sorted = runs.sorted
    (sorted.slice(1, 4).sum / 3.0, runs)
  }

  def report(name: String, extra: () => String = () => "")(fn: => Unit): Double = {
    val (mean, runs) = measure(fn)
    val spread = if (mean > 0) (runs.max - runs.min) / mean else 0.0
    val ex = extra()
    println(f"$name%s ${if (ex.nonEmpty) ex + " " else ""}trimmed_mean=$mean%.3f " +
      f"spread=${spread * 100}%.1f%% runs=${runs.map(t => f"$t%.3f").mkString(",")}")
    mean
  }
}
