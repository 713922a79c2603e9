package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guards for compute-bound stages. */
private[graft] object Par {

  /**
   * CPU-heavy per-row stages (shingling, minhash, simhash, embedding) are
   * compute-, not IO-bound: a small parquet input arrives as ONE split,
   * which would run the whole hot loop on one core (measured: the sf0.1
   * documents table is a single 580 KB file — every core but one idles).
   * Widen to the session's parallelism when the source is narrower; at
   * corpus scale inputs already arrive in thousands of splits and this
   * is a no-op. The shuffle moved is the raw input (cheap); the work
   * saved is the per-row kernel (expensive).
   */
  def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
