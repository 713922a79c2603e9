package graft

import org.apache.spark.sql.SparkSession

/**
 * Library façade: one call to get a properly configured session with the
 * engine's extensions (vector SQL functions, the KnnJoin strategy, the
 * vector-simplification rule) installed.
 *
 * {{{
 * val spark = Graft.session()                  // local dev
 * val spark = Graft.configure(builder).getOrCreate()  // bring your own
 * }}}
 */
object Graft {

  /** Apply the engine's recommended configs + extensions to any builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events-style INT64 TIMESTAMP(NANOS) parquet reads as raw nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // DataFrame exchanges move UnsafeRows (serializer-independent), but
      // the dedup/LSH block grids and the serving slabs shuffle RDDs of
      // (id, Array[Long|Float]) tuples — Kryo writes those as length +
      // raw primitives where Java serialization writes full object
      // streams (~2-3× the bytes and CPU on the grid exchanges)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .withExtensions(new GraftExtensions)

  /** Local session with the engine installed (shuffle partitions sized to
    * the requested core count, not the 200 default). */
  def session(master: String = "local[*]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = configure(
      SparkSession.builder()
        .master(master)
        .appName("graft")
        .config("spark.sql.shuffle.partitions", shufflePartitions.toString))
      .getOrCreate()
    // getOrCreate may return a pre-existing session whose builder never saw
    // our extensions — make function registration idempotent either way
    functions.VectorFunctions.registerAll(spark)
    functions.TextFunctions.registerAll(spark)
    plans.KnnJoinPlan.install(spark)
    spark
  }
}
