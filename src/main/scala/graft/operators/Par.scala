package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guards for compute-bound stages. */
private[graft] object Par {

  /**
   * CPU-heavy per-row stages (shingling, minhash, simhash, embedding) are
   * compute-, not IO-bound: a small parquet input arrives as ONE split,
   * which would run the whole hot loop on one core (measured: the sf0.1
   * documents table is a single 580 KB file — every core but one idles).
   * Widen to the session's parallelism when the source would naturally
   * split narrower; at corpus scale inputs already arrive in thousands
   * of splits and this is a no-op. The shuffle moved is the raw input
   * (cheap); the work saved is the per-row kernel (expensive).
   *
   * The split estimate comes from file-source METADATA only
   * (`inputFiles` + optimizer statistics): converting to an RDD for
   * `getNumPartitions` would force AQE to materialize every upstream
   * query stage and then re-run it under the repartitioned plan. A
   * non-file source (memory stream, local relation) or one without
   * usable stats keeps its plan untouched — the guard only ever ADDS a
   * repartition where file metadata proves the scan is narrow.
   */
  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val files = try df.inputFiles.length catch { case _: Throwable => 0 }
    if (files == 0 || files >= p) return df
    // natural split count ≈ max(files, bytes / maxPartitionBytes)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxPart = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    val bySize =
      if (bytes <= 0 || maxPart <= 0) BigInt(Int.MaxValue)
      else (bytes + maxPart - 1) / maxPart
    val est = BigInt(files).max(bySize)
    if (est < p) df.repartition(p) else df
  }
}
