package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/**
 * Same-JVM A/B of the block-grid grouped exchange
 * (`runMain graft.tools.GridShuffleAB <dir>`): the uncached ×100 cosine
 * pair build (`embeddingNearDupPairs` at 0.9, the auto-LSH route — the
 * dedup family's measured shuffle floor) under
 *
 *  - `groupByKey` (the legacy form: spillable per-key read-side
 *    buffers; production until round 11), vs
 *  - `repartitionAndSortWithinPartitions` + streamed sorted runs
 *    (sort-based grouping, no per-key buffering on the read side —
 *    the production default since round 11),
 *
 * toggled via `graft.grid.sortShuffle` between phases in ONE JVM so
 * page cache / JIT / GC state is shared, each under [[Timing]]'s
 * trimmed-mean-of-5. Pair counts print per phase — identical by
 * construction (same cells, same scan kernel).
 *
 * Measured 2026-08 (both orders, two JVMs): sort-based 6.2–7.4 s vs
 * groupByKey 11.9–18.2 s → sort-based became `scanCells`' default.
 */
object GridShuffleAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val path = args.lift(1).getOrElse("pairbuild") // pairbuild | cosinedelta
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    e.count() // page-cache warm before either phase

    // cosinedelta: the incremental path (persisted 90% index, 10% delta)
    // — the grid here is the flagged delta form, worth its own A/B
    // because its cells carry the isNew flag and a different key shape
    lazy val deltaIx = {
      val i = Dedup.buildCosineIndex(
        e.where(org.apache.spark.sql.functions.col("vec_id") % 10 =!= 0),
        "vec_id", "embedding")
      i.buckets.persist().count(); i.vecs.persist().count()
      i
    }
    lazy val eNew = e.where(org.apache.spark.sql.functions.col("vec_id") % 10 === 0)

    def phase(label: String, sort: Boolean): Unit = {
      System.setProperty("graft.grid.sortShuffle", sort.toString)
      var p = -1L
      Timing.report(s"${path}_$label", extra = () => s"pairs=$p") {
        p =
          if (path == "cosinedelta")
            Dedup.cosineDeltaPairs(deltaIx, eNew, "vec_id", "embedding", 0.9).count()
          else
            Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", 0.9).count()
      }
    }
    phase("groupByKey", sort = false)
    phase("sortShuffle", sort = true)
    phase("groupByKey2", sort = false) // drift control: repeat phase 1
    System.clearProperty("graft.grid.sortShuffle")
    spark.stop()
  }
}
