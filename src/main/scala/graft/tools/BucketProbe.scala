package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: minhash (band,bucket) occupancy at a given sf —
  * how many candidate pairs would a candidates-then-hydrate route emit
  * vs the sets-riding grid's payload. */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val banded = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, t) =>
          val sh = graft.operators.Dedup.shinglesOf(t, 3)
          val b = graft.operators.Dedup.bandBucketsOf(md, sh, 16, 4)
          (0 until 4).iterator.map(x => (x, b(x), sh.length))
        }
      }
      .toDF("band", "bucket", "nsh")
    val stats = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("m"), sum(col("nsh")).as("shingles"))
      .agg(count(lit(1)).as("buckets"),
        sum(col("m")).as("rows"),
        sum(col("m") * (col("m") - 1) / 2).as("cand_pairs"),
        max(col("m")).as("max_m"),
        sum(when(col("m") === 1, 1L).otherwise(0L)).as("singletons"),
        sum(col("shingles")).as("tot_shingle_rows"))
      .head()
    println(f"banding wall ${(System.nanoTime() - t0) / 1e9}%.1f s")
    println(s"buckets=${stats.getLong(0)} rows=${stats.getLong(1)} " +
      s"cand_pairs=${stats.getAs[Any](2)} max_m=${stats.getLong(3)} " +
      s"singletons=${stats.getLong(4)} shingle_payload_rows=${stats.getLong(5)}")
    spark.stop()
  }
}
