package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/**
 * Direction probe for the LSH grid's block size
 * (`-Dgraft.lsh.blockRows`): shuffle payload scales as Σ m²/blockRows
 * (each of a bucket's m rows ships to its nb = ⌈m/blockRows⌉ block-pair
 * tasks) while per-task scan space grows as blockRows² — this times the
 * full uncached cosine pair build at one setting (warm-up + 3 runs,
 * min/mean printed) so the trade can be mapped cheaply before pinning a
 * default. `runMain graft.tools.BlockRowsProbe <dir>`.
 */
object BlockRowsProbe {
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
    e.count()
    val br = sys.props.get("graft.lsh.blockRows").orElse(sys.env.get("GRAFT_LSH_BLOCK_ROWS")).getOrElse("2048")
    def once(): Double = {
      val t0 = System.nanoTime()
      Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", 0.9).count()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm-up
    val runs = Seq.fill(3)(once())
    println(f"blockRows=$br pair_build min=${runs.min}%.2f mean=${runs.sum / 3}%.2f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    spark.stop()
  }
}
