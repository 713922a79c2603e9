package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * The q84/q86 daily-ingest loop as a STREAM: each micro-batch of
 * documents near-dup-dedups against the latest persisted
 * [[Dedup.MinhashIndex]] snapshot at delta cost (old×old never
 * re-scanned), emits its pairs, and folds itself into a NEW snapshot
 * version so the next batch sees it. The reference's incremental
 * ingestion surface (day_8/main/endpoints.py:13-49,168-208 incremental
 * inserts; day_10/embedders/embedding_pipeline.py:238-314 the
 * incremental-cache regime) composed with the archive-dedup operators.
 *
 * Snapshot layout: `archiveDir/base` is the seeded day-0 index
 * ([[seedArchive]]); each processed batch b writes `archiveDir/b<id>`
 * containing ONLY that batch's banding keys and set payloads (a
 * batch-sized sliver under the base's pinned widths — banding is a
 * pure per-doc function, so the live index is exactly
 * base ∪ b0 ∪ … ∪ bN by unionByName, no re-mine, no archive rewrite).
 * Readers union base + slivers; writes never touch an existing
 * directory — append-only versions, the classic snapshot-isolation
 * shape — so a reader of version N is undisturbed by the writer
 * producing N+1, and the PER-BATCH write cost is batch-sized, not
 * archive-sized. Long streams fold slivers back into a fresh base with
 * [[compactArchive]] (out-of-band; every read is equivalent before and
 * after).
 *
 * Restart semantics: Structured Streaming may REPLAY a micro-batch
 * after a failure. Both effects are idempotent per batchId — pairs land
 * in a `batch_id=<id>` partition directory with overwrite mode, and the
 * fold is skipped when `b<id>` already exists (a replayed batch would
 * otherwise double-fold and then trip the delta-disjointness guard).
 *
 * Scale shape: identical to [[Dedup.minhashDeltaPairs]] +
 * [[Dedup.appendToMinhashIndex]] — banding cost tracks the batch, the
 * m ≥ 2 ∧ has-delta filter prunes untouched buckets, and the snapshot
 * write is (archive + batch)-sized parquet. A long-running stream
 * should compact old versions out-of-band (each snapshot is
 * self-contained, so dropping all but the latest is safe once no
 * reader pins them).
 */
object ArchiveDedup {

  /** Write the day-0 archive: mine `corpus` once, save as `dir/base`. */
  def seedArchive(corpus: DataFrame, dir: String, idCol: String,
                  textCol: String, numHashes: Int = 16, bands: Int = 4,
                  shingleLen: Int = 3): Unit =
    Dedup.saveMinhashIndex(
      Dedup.buildMinhashIndex(corpus, idCol, textCol, numHashes, bands, shingleLen),
      s"$dir/base")

  /** (live index = base ∪ every sliver, last folded batchId or -1). */
  private[graft] def loadLatest(spark: SparkSession,
                                dir: String): (Dedup.MinhashIndex, Long) = {
    val base = Dedup.loadMinhashIndex(spark, s"$dir/base")
    val versions = listVersions(spark, dir)
    val live = versions.foldLeft(base) { (ix, b) =>
      val sliver = Dedup.loadMinhashIndex(spark, s"$dir/b$b")
      Dedup.MinhashIndex(
        ix.buckets.unionByName(sliver.buckets.select(col("bkt"), col("id"))),
        ix.sets.unionByName(sliver.sets.select(col("id"), col("sh"))),
        ix.numHashes, ix.bands, ix.shingleLen)
    }
    (live, versions.lastOption.getOrElse(-1L))
  }

  /** Fold every sliver into a fresh self-contained base at `dstDir`
    * (reads are equivalent before and after; run out-of-band, then
    * point the stream at the compacted dir). */
  def compactArchive(spark: SparkSession, dir: String, dstDir: String): Unit = {
    val (live, _) = loadLatest(spark, dir)
    Dedup.saveMinhashIndex(live, s"$dstDir/base")
  }

  // Hadoop FS, not java.io.File: the archive lives wherever the corpus
  // does (HDFS/S3/local) — same convention as serving.DocStore
  private def hfs(spark: SparkSession, dir: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def listVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val (fs, p) = hfs(spark, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case n if n.startsWith("b") && n.length > 1 && n.drop(1).forall(_.isDigit) =>
        n.drop(1).toLong
    }.sorted
  }

  /** One micro-batch, exposed for direct testing (and for callers
    * driving their own batch loop): dedup `batch` against the latest
    * snapshot, write its pairs under `pairsDir/batch_id=<id>`, fold it
    * into snapshot `b<id>`. Replay-safe: an existing `b<id>` means this
    * batch already ran — both effects are skipped/overwritten, never
    * doubled. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
                                  archiveDir: String, pairsDir: String,
                                  idCol: String, textCol: String,
                                  threshold: Double): Unit = {
    val spark = batch.sparkSession
    val (fs, _) = hfs(spark, archiveDir)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$archiveDir/b$batchId")))
      return // replayed batch: both effects already durable
    val (ix, _) = loadLatest(spark, archiveDir)
    // one materialization of the batch feeds banding, sets, guard, and
    // the fold — micro-batches are delta-sized by definition
    val b = batch.select(col(idCol).cast("long").as(idCol), col(textCol))
      .localCheckpoint()
    Dedup.minhashDeltaPairs(ix, b, idCol, textCol, threshold)
      .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
    // fold = persist a BATCH-SIZED sliver under the archive's pinned
    // widths; the union with base happens at load (appendToMinhashIndex
    // is the same union for in-session callers — here the sliver IS
    // the durable form of that append)
    Dedup.saveMinhashIndex(
      Dedup.buildMinhashIndex(b, idCol, textCol,
        ix.numHashes, ix.bands, ix.shingleLen),
      s"$archiveDir/b$batchId")
  }

  /** Start the stream: `docs` (a streaming DataFrame of (idCol,
    * textCol, …)) → per-batch archive dedup + fold. */
  def archiveDedupSink(docs: DataFrame, archiveDir: String,
                       pairsDir: String, idCol: String, textCol: String,
                       threshold: Double = 0.5,
                       checkpoint: Option[String] = None): StreamingQuery = {
    val w = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, archiveDir, pairsDir, idCol, textCol, threshold)
      }
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  // ---- the EMBEDDING twin: streamed vectors vs a cosine archive ------
  // (the reference's embedding-cache regime consumed as a stream, ref:
  // day_10/embedders/embedding_pipeline.py:238-314) — same snapshot
  // layout, same replay contract, [[Dedup.CosineIndex]] underneath.

  /** Day-0 embedding archive: widths auto-size at the seed corpus and
    * are PINNED for every later sliver (pass explicit widths if the
    * stream will far outgrow the seed). */
  def seedCosineArchive(corpus: DataFrame, dir: String, idCol: String,
                        vecCol: String, numBits: Int = -1, bands: Int = -1,
                        dim: Int = -1, seed: Long = 42L): Unit =
    Dedup.saveCosineIndex(
      Dedup.buildCosineIndex(corpus, idCol, vecCol, numBits, bands, dim, seed),
      s"$dir/base")

  /** (live cosine index = base ∪ every sliver, last batchId or -1). */
  private[graft] def loadLatestCosine(spark: SparkSession,
                                      dir: String): (Dedup.CosineIndex, Long) = {
    val base = Dedup.loadCosineIndex(spark, s"$dir/base")
    val versions = listVersions(spark, dir)
    val live = versions.foldLeft(base) { (ix, b) =>
      val sliver = Dedup.loadCosineIndex(spark, s"$dir/b$b")
      Dedup.CosineIndex(
        ix.buckets.unionByName(sliver.buckets.select(col("bkt"), col("id"))),
        ix.vecs.unionByName(sliver.vecs.select(col("id"), col("v"))),
        ix.numBits, ix.bands, ix.dim, ix.seed)
    }
    (live, versions.lastOption.getOrElse(-1L))
  }

  /** One embedding micro-batch: cosine-dedup against the live archive,
    * write pairs under `batch_id=<id>`, persist the batch's sliver
    * (signatures + vectors under the base's pinned widths). Replay-safe
    * like [[processBatch]]. */
  private[graft] def processCosineBatch(batch: DataFrame, batchId: Long,
                                        archiveDir: String, pairsDir: String,
                                        idCol: String, vecCol: String,
                                        threshold: Double,
                                        exactLimit: Long = 10000L): Unit = {
    val spark = batch.sparkSession
    val (fs, _) = hfs(spark, archiveDir)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$archiveDir/b$batchId")))
      return // replayed batch: both effects already durable
    val (ix, _) = loadLatestCosine(spark, archiveDir)
    val b = batch.select(col(idCol).cast("long").as(idCol), col(vecCol))
      .localCheckpoint()
    Dedup.cosineDeltaPairs(ix, b, idCol, vecCol, threshold, exactLimit)
      .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
    Dedup.saveCosineIndex(
      Dedup.buildCosineIndex(b, idCol, vecCol,
        ix.numBits, ix.bands, ix.dim, ix.seed),
      s"$archiveDir/b$batchId")
  }

  /** Start the embedding stream: per-batch cosine archive dedup + fold. */
  def cosineArchiveDedupSink(vecs: DataFrame, archiveDir: String,
                             pairsDir: String, idCol: String, vecCol: String,
                             threshold: Double = 0.9,
                             exactLimit: Long = 10000L,
                             checkpoint: Option[String] = None): StreamingQuery = {
    val w = vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processCosineBatch(batch, batchId, archiveDir, pairsDir,
          idCol, vecCol, threshold, exactLimit)
      }
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }
}
