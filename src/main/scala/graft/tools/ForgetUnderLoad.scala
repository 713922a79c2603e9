package graft.tools

import graft.streaming.ArchiveDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Forget-UNDER-LOAD measurement (round-14 ask #6): ForgetScale times
 * takedowns against a QUIESCED archive; the contract says the stream
 * keeps running and a fold racing the takedown's generation commit
 * ABORTS the commit (retry wins). This tool executes that interaction
 * at scale and publishes it: a background "stream" thread folds delta
 * batches back-to-back through the real per-batch operator while the
 * main thread, mid-stream, runs `forgetDocs` with retry-on-abort —
 * reporting per-batch walls (marking batches that overlapped the
 * takedown), the takedown's per-attempt wall, the abort/retry count,
 * and the end-state check (victims gone, survivors + raced batches
 * all present).
 *
 * Usage: runMain graft.tools.ForgetUnderLoad <dir> [nBatches]
 *   [batchRows] [foldAfter]
 * (minhash over documents; victims = seed-side id%100==7, ~1%.)
 */
object ForgetUnderLoad {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val batchRows = args.lift(2).map(_.toLong).getOrElse(5000L)
    val foldAfter = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = spark.read.parquet(s"$dir/documents.parquet")
    val archive = java.nio.file.Files.createTempDirectory("graft-ful").toString
    val pairsDir = java.nio.file.Files.createTempDirectory("graft-ful-p").toString
    val oldSide = rows.where(col("doc_id") % 10 =!= 0)
    val newSide = rows.where(col("doc_id") % 10 === 0)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))

    val t0 = System.nanoTime()
    ArchiveDedup.seedArchive(oldSide, archive, "doc_id", "text")
    println(f"seed (${oldSide.count()} rows)                      " +
      f"${(System.nanoTime() - t0) / 1e9}%8.2f s")

    // ---- the "stream": back-to-back folds on a background thread ----
    @volatile var batchDone = 0
    val walls = new java.util.concurrent.ConcurrentHashMap[Int, Double]()
    val streamT = new Thread(() => {
      (0 until nBatches).foreach { b =>
        val batch = newSide
          .where(col("__rn") > b * batchRows && col("__rn") <= (b + 1) * batchRows)
          .select(col("doc_id"), col("text"))
        val s0 = System.nanoTime()
        ArchiveDedup.processBatch(batch, b.toLong, archive, pairsDir,
          "doc_id", "text", 0.5, compactEvery = 8)
        walls.put(b, (System.nanoTime() - s0) / 1e9)
        batchDone = b + 1
      }
    }, "graft-ful-stream")
    streamT.start()

    // ---- the takedown, mid-stream, with retry-on-abort ----
    while (batchDone < foldAfter) Thread.sleep(50)
    val victims = rows.where(col("doc_id") % 100 === 7)
      .select(col("doc_id").cast("long").as("id"))
    val nVictims = victims.count()
    var aborts = 0
    var done = false
    val f0 = System.nanoTime()
    val takedownStartedAt = batchDone
    while (!done) {
      val a0 = System.nanoTime()
      try {
        ArchiveDedup.forgetDocs(spark, archive, victims)
        done = true
        println(f"forgetDocs attempt ${aborts + 1} ($nVictims ids)        " +
          f"${(System.nanoTime() - a0) / 1e9}%8.2f s  SUCCESS")
      } catch {
        case e: IllegalStateException if e.getMessage.contains("aborting") =>
          aborts += 1
          println(f"forgetDocs attempt $aborts%d ($nVictims ids)        " +
            f"${(System.nanoTime() - a0) / 1e9}%8.2f s  ABORTED (racing fold)")
      }
    }
    val takedownWall = (System.nanoTime() - f0) / 1e9
    val takedownEndedAt = batchDone
    streamT.join()

    (0 until nBatches).foreach { b =>
      val mark =
        if (b >= takedownStartedAt && b < takedownEndedAt + 1) " <- takedown window"
        else ""
      println(f"batch $b%3d wall ${walls.get(b)}%8.2f s$mark")
    }
    println(f"takedown total (incl. $aborts aborts/retries)      $takedownWall%8.2f s")

    // ---- end-state check: victims gone, everything else present ----
    val (ix, _) = ArchiveDedup.loadLatest(spark, archive)
    val archived = ix.sets.select(col("id"))
    val victimLeft = archived.join(victims, Seq("id")).count()
    val expected = oldSide.count() + math.min(nBatches * batchRows,
      newSide.count()) - nVictims
    println(s"victims still archived: $victimLeft (must be 0); " +
      s"archived rows ${archived.count()} (expected $expected)")
    spark.stop()
    if (victimLeft != 0) sys.exit(1)
  }
}
