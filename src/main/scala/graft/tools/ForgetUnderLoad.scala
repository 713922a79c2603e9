package graft.tools

import graft.operators.CorpusStats
import graft.streaming.ArchiveDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Forget-UNDER-LOAD measurement (round-14 ask #6; stats families added
 * round 15 per ask #6): ForgetScale times takedowns against a QUIESCED
 * archive; the contract says the stream keeps running and — for the
 * dedup families, whose takedown commits a full generation — a fold
 * racing that commit ABORTS it (retry wins). This tool executes the
 * interaction at scale and publishes it: a background "stream" thread
 * folds delta batches back-to-back through the real per-batch operator
 * while the main thread, mid-stream, runs the takedown with
 * retry-on-abort — reporting per-batch walls (marking batches that
 * overlapped the takedown), the takedown's per-attempt wall, the
 * abort/retry count, and the end-state check (victims gone, survivors
 * + raced batches all present and exact).
 *
 * The STATS families' takedown (`retractFrom*StatsArchive`) commits an
 * ADDITIVE x entry instead of rebuilding a generation, so it has no
 * structural abort path — the published numbers there are the batch
 * blip and the end-state count-exactness under the race (the
 * forget-under-load contract the archives' scaladoc promises).
 *
 * Usage: runMain graft.tools.ForgetUnderLoad <dir> [nBatches]
 *   [batchRows] [foldAfter] [family: minhash|token|ngram]
 * (victims = seed-side id%100==7, ~1% of the corpus.)
 */
object ForgetUnderLoad {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val batchRows = args.lift(2).map(_.toLong).getOrElse(5000L)
    val foldAfter = args.lift(3).map(_.toInt).getOrElse(3)
    val family = args.lift(4).getOrElse("minhash")
    require(Set("minhash", "token", "ngram")(family),
      s"unknown family '$family' — minhash|token|ngram")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = spark.read.parquet(s"$dir/documents.parquet")
    val archive = java.nio.file.Files.createTempDirectory(s"graft-ful-$family").toString
    val pairsDir = java.nio.file.Files.createTempDirectory("graft-ful-p").toString
    val oldSide = rows.where(col("doc_id") % 10 =!= 0)
    val newSide = rows.where(col("doc_id") % 10 === 0)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))

    def seed(): Unit = family match {
      case "minhash" => ArchiveDedup.seedArchive(oldSide, archive, "doc_id", "text")
      case "token" =>
        CorpusStats.seedTokenStatsArchive(oldSide, archive, "doc_id", "text")
      case "ngram" =>
        CorpusStats.seedNgramStatsArchive(oldSide, archive, "doc_id", "text")
    }
    def fold(batch: DataFrame, b: Long): Unit = family match {
      case "minhash" => ArchiveDedup.processBatch(batch, b, archive, pairsDir,
        "doc_id", "text", 0.5, compactEvery = 8)
      case "token" => CorpusStats.processTokenStatsBatch(batch, b, archive,
        "doc_id", "text", compactEvery = 8)
      case "ngram" => CorpusStats.processNgramStatsBatch(batch, b, archive,
        "doc_id", "text", compactEvery = 8)
    }

    val t0 = System.nanoTime()
    seed()
    println(f"seed [$family] (${oldSide.count()} rows)            " +
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
        fold(batch, b.toLong)
        walls.put(b, (System.nanoTime() - s0) / 1e9)
        batchDone = b + 1
      }
    }, "graft-ful-stream")
    streamT.start()

    // ---- the takedown, mid-stream, with retry-on-abort ----
    while (batchDone < foldAfter) Thread.sleep(50)
    // victims need TEXT for the stats families (counts subtract by
    // replaying the folded text); the dedup twin ignores extra columns
    val victimDocs = rows.where(col("doc_id") % 100 === 7)
      .select(col("doc_id"), col("text"))
    val nVictims = victimDocs.count()
    var aborts = 0
    var done = false
    val f0 = System.nanoTime()
    val takedownStartedAt = batchDone
    while (!done) {
      val a0 = System.nanoTime()
      try {
        family match {
          case "minhash" => ArchiveDedup.forgetDocs(spark, archive,
            victimDocs.select(col("doc_id").cast("long").as("id")))
          case "token" => CorpusStats.retractFromTokenStatsArchive(
            spark, archive, victimDocs, "doc_id", "text")
          case "ngram" => CorpusStats.retractFromNgramStatsArchive(
            spark, archive, victimDocs, "doc_id", "text")
        }
        done = true
        println(f"takedown attempt ${aborts + 1} ($nVictims ids)        " +
          f"${(System.nanoTime() - a0) / 1e9}%8.2f s  SUCCESS")
      } catch {
        case e: IllegalStateException if e.getMessage.contains("aborting") =>
          aborts += 1
          println(f"takedown attempt $aborts%d ($nVictims ids)        " +
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

    // ---- end-state check: victims gone, everything else present/exact ----
    val foldedDocs = newSide.where(col("__rn") <= nBatches * batchRows)
      .select(col("doc_id"), col("text"))
    val survivors = oldSide.select(col("doc_id"), col("text"))
      .unionByName(foldedDocs)
      .where(col("doc_id") % 100 =!= 7)
    val exitBad: Boolean = family match {
      case "minhash" =>
        val (ix, _) = ArchiveDedup.loadLatest(spark, archive)
        val archived = ix.sets.select(col("id"))
        val victimLeft = archived
          .join(victimDocs.select(col("doc_id").cast("long").as("id")), Seq("id"))
          .count()
        val expected = survivors.count()
        println(s"victims still archived: $victimLeft (must be 0); " +
          s"archived rows ${archived.count()} (expected $expected)")
        victimLeft != 0 || archived.count() != expected
      case _ =>
        // count-exactness under the race: the live archive's sums must
        // equal a from-scratch build over (survivors + raced batches) —
        // the same differential oracle the sequence gate runs, at x100
        val c0 = System.nanoTime()
        val bad =
          if (family == "token") {
            val got = CorpusStats.tokenDf(
              CorpusStats.loadTokenStatsArchive(spark, archive))
            val want = CorpusStats.tokenDf(
              CorpusStats.buildTokenStats(survivors, "doc_id", "text"))
            got.exceptAll(want).unionByName(want.exceptAll(got)).limit(1).count()
          } else {
            def pairsOf(ix: CorpusStats.NgramStatsIndex): DataFrame =
              ix.pairParts.groupBy(col("__h1"), col("__h2"))
                .agg(sum(col("pc_part")).as("pc")).where(col("pc") > 0)
            val got = pairsOf(CorpusStats.loadNgramStatsArchive(spark, archive))
            val want = pairsOf(CorpusStats.buildNgramStats(survivors, "doc_id", "text"))
            got.exceptAll(want).unionByName(want.exceptAll(got)).limit(1).count()
          }
        println(f"end-state differential oracle (archive vs recompute over " +
          f"survivors+raced): ${if (bad == 0) "EXACT" else "MISMATCH"} " +
          f"(${(System.nanoTime() - c0) / 1e9}%.1f s)")
        bad != 0
    }
    spark.stop()
    if (exitBad) sys.exit(1)
  }
}
