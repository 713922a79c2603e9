package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/**
 * Same-sweep A/B of the hyperplane-banding kernel (scalar loop vs the
 * plane-parallel SIMD path, `-Dgraft.banding.simd` toggled between
 * phases in ONE JVM so page cache / JIT / GC state is shared):
 * `runMain graft.tools.CosineAB <dir>` times
 *
 *  - the pure banding pass (CosineIndex buckets materialization — the
 *    signature kernel with no pair scan behind it), and
 *  - the full uncached cosine pair build (`embeddingNearDupPairs` at
 *    0.9, the auto-LSH route at ×100 size — the dedup family's floor),
 *
 * each under [[Timing]]'s trimmed-mean-of-5 protocol. Outputs are
 * identical between phases by the PlaneProjector bit-parity gate
 * (PlaneProjectorSpec), so rows differ only in kernel time.
 */
object CosineAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
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

    def phase(label: String, simd: Boolean): Unit = {
      System.setProperty("graft.banding.simd", simd.toString)
      var n = -1L
      Timing.report(s"banding_only_$label", extra = () => s"keys=$n") {
        n = Dedup.buildCosineIndex(e, "vec_id", "embedding").buckets.count()
      }
      var p = -1L
      Timing.report(s"pair_build_$label", extra = () => s"pairs=$p") {
        p = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", 0.9).count()
      }
    }
    phase("scalar", simd = false)
    phase("simd", simd = true)
    System.clearProperty("graft.banding.simd")
    spark.stop()
  }
}
