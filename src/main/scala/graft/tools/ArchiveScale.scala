package graft.tools

import graft.streaming.ArchiveDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale measurement for the streaming archive-dedup loop
 * (`runMain graft.tools.ArchiveScale <dir> [nBatches] [batchRows]`):
 * seed the archive from 90% of the corpus (one-time), then drive N
 * delta batches of the remaining docs through
 * [[ArchiveDedup.processBatch]], timing each — per-batch wall is the
 * number a daily/hourly ingest pipeline actually pays, and it should
 * stay batch-shaped while the archive grows underneath it.
 */
object ArchiveScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(5)
    val batchRows = args.lift(2).map(_.toLong).getOrElse(10000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val archive = java.nio.file.Files.createTempDirectory("graft-archive").toString
    val pairsDir = java.nio.file.Files.createTempDirectory("graft-archive-pairs").toString
    val oldSide = docs.where(col("doc_id") % 10 =!= 0)
    // global row_number is measurement-harness batch slicing over the
    // 10% delta slice (50k rows at ×100), never a product path — a real
    // ingest's batches arrive pre-partitioned from the source
    val newSide = docs.where(col("doc_id") % 10 === 0)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))

    def timed[T](name: String)(fn: => T): T = {
      val t0 = System.nanoTime()
      val r = fn
      println(f"$name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    timed(s"seed archive (${oldSide.count()} docs, one-time)") {
      ArchiveDedup.seedArchive(oldSide, archive, "doc_id", "text")
    }
    (0 until nBatches).foreach { b =>
      val batch = newSide
        .where(col("__rn") > b * batchRows && col("__rn") <= (b + 1) * batchRows)
        .select(col("doc_id"), col("text"))
      timed(s"batch $b ($batchRows docs vs growing archive)") {
        ArchiveDedup.processBatch(batch, b.toLong, archive, pairsDir,
          "doc_id", "text", 0.5)
      }
    }
    val pairs = spark.read.option("basePath", pairsDir).parquet(pairsDir)
    println(s"total pairs: ${pairs.count()} across $nBatches batches")
    spark.stop()
  }
}
