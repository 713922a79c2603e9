package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental corpus-statistics indexes for the quality battery — the
 * daily-ingest twin of the [[Dedup]] index family, for the filters
 * whose signal is a CORPUS-WIDE count: token document frequency
 * (rare-token metrics, ref day_12 quality heuristics / CCNet's
 * frequency regime) and the bigram-LM counts behind perplexity-style
 * scoring.
 *
 * Why incremental: at 100 TB the dominant cost of refreshing these
 * statistics is re-TOKENIZING the archive — reading every byte of text
 * again — while the counts themselves are compact columnar frames
 * (one row per distinct token / bigram). So the index archives PARTIAL
 * counts: `build*` tokenizes the seed corpus once; `appendTo*`
 * tokenizes the DELTA only and unions its partial counts (exact —
 * batches carry disjoint doc ids, enforced by the dedup family's own
 * [[Dedup.requireDeltaDisjoint]] guard: document frequency and bigram
 * counts are additive over disjoint document sets); consumers
 * aggregate the compact count frames at use time, which costs a
 * narrow-key hash aggregate instead of a corpus re-read. Same
 * persistence contract as the dedup indexes: save/load parquet
 * directories, lazy frames, the NEXT day's delta folds in at delta
 * cost.
 *
 * Measured decision rule (tools.StatsScale, BENCH.md "Round 12"):
 * at ×100 (500k docs, 10% delta) the incremental path scores the
 * delta at 0.40× the full token-df recompute (2.27 s vs 5.70 s) and
 * 0.56× the full bigram recompute (2.96 s vs 5.25 s) — the gap is the
 * archive's text, which the incremental path never re-reads, so it
 * widens with corpus/delta ratio (at 100 TB / daily-delta scales the
 * rebuild term dominates outright). BELOW ~50k short docs both paths
 * are Spark-job-floor-bound and the extra index jobs make incremental
 * SLOWER (×10: 1.4 s vs 1.1 s) — keep batch recompute for small
 * corpora; the index pays off once the archive dwarfs the delta.
 *
 * Exactness gates: the `*Against` scorers reproduce the batch
 * operators bit-for-bit when the index covers the target's corpus —
 * q91 replays q73's oracle and q92 replays q79's through the
 * incremental path (build + append ≡ one batch pass), the same
 * same-rows-different-engine-path discipline as q86/q87/q89.
 */
object CorpusStats {

  // ===================================================================
  // Token document frequency (the q73 family)
  // ===================================================================

  /** Partial df counts per batch: `parts` holds (w, tdf_part) rows —
    * one per distinct token PER FOLDED BATCH (df is additive across
    * disjoint doc sets); `ids` is the indexed doc-id set (disjointness
    * guard + coverage checks). */
  final case class TokenStatsIndex(parts: DataFrame, ids: DataFrame)

  private def tokenRows(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol).cast("long").as("doc_id"),
      explode(QualityFilters.words(lower(col(textCol)))).as("w"))

  private def tokenParts(docs: DataFrame, idCol: String, textCol: String) =
    tokenRows(docs, idCol, textCol)
      .groupBy(col("w")).agg(countDistinct(col("doc_id")).as("tdf_part"))

  private def idFrame(docs: DataFrame, idCol: String) =
    docs.select(col(idCol).cast("long").as("id")).distinct()

  def buildTokenStats(docs: DataFrame, idCol: String,
                      textCol: String): TokenStatsIndex =
    TokenStatsIndex(tokenParts(docs, idCol, textCol), idFrame(docs, idCol))

  /** Fold a NEW batch in at DELTA cost: tokenize the delta only, union
    * its partial counts (df over disjoint doc sets is a sum of per-set
    * dfs — no re-aggregation of the archive). */
  def appendToTokenStats(ix: TokenStatsIndex, newDocs: DataFrame,
                         idCol: String, textCol: String): TokenStatsIndex = {
    Dedup.requireDeltaDisjoint(ix.ids, newDocs, idCol, "appendToTokenStats")
    TokenStatsIndex(
      ix.parts.select(col("w"), col("tdf_part"))
        .unionByName(tokenParts(newDocs, idCol, textCol)),
      ix.ids.select(col("id")).unionByName(idFrame(newDocs, idCol)))
  }

  def saveTokenStats(ix: TokenStatsIndex, dir: String): Unit = {
    ix.parts.write.mode("overwrite").parquet(s"$dir/df")
    ix.ids.write.mode("overwrite").parquet(s"$dir/ids")
  }

  def loadTokenStats(spark: SparkSession, dir: String): TokenStatsIndex =
    TokenStatsIndex(spark.read.parquet(s"$dir/df"),
      spark.read.parquet(s"$dir/ids"))

  /** Final document frequency per token — one narrow-key aggregate
    * over the compact partial-count rows. */
  def tokenDf(ix: TokenStatsIndex): DataFrame =
    ix.parts.groupBy(col("w")).agg(sum(col("tdf_part")).as("tdf"))

  /** Per-document token-frequency metrics of `target`, scored against
    * the INDEX's df — identical to
    * [[QualityFilters.tokenFrequencyMetrics]] over the index's corpus
    * when the index covers `target` (q91 gates this through q73's
    * oracle), and the actual daily regime otherwise: today's delta
    * scored against cumulative corpus statistics without re-reading
    * the archive's text. Coverage contract: a target token the index
    * has never seen has no df and is DROPPED from the metrics (inner
    * join) — fold the target first (the daily loop does) or accept
    * seen-token metrics for an uncovered frame. */
  def tokenFrequencyMetricsAgainst(ix: TokenStatsIndex, target: DataFrame,
                                   idCol: String, textCol: String,
                                   rareDf: Int = 3): DataFrame =
    tokenRows(target, idCol, textCol)
      .join(tokenDf(ix), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("tdf")).cast("double") / count(lit(1)), 6).as("mean_token_df"),
        min(col("tdf")).as("min_token_df"),
        round(sum(when(col("tdf") < rareDf, lit(1L)).otherwise(lit(0L))).cast("double")
          / count(lit(1)), 6).as("rare_ratio"))

  // ===================================================================
  // Bigram-LM counts (the q79 family)
  // ===================================================================

  /** Partial bigram-model counts per batch: pair counts C(w₁w₂),
    * context counts C(w₁·) — both additive over disjoint doc sets —
    * and the batch's distinct unigram hashes (vocabulary size is a
    * distinct-count over their union at use time, the one statistic
    * that is NOT additive). */
  final case class NgramStatsIndex(pairParts: DataFrame,
                                   contextParts: DataFrame,
                                   unigrams: DataFrame,
                                   ids: DataFrame)

  private def bigramFrame(docs: DataFrame, idCol: String, textCol: String) = {
    val spark = docs.sparkSession
    import spark.implicits._
    QualityFilters.tokenHashStream(docs, idCol, textCol)
      .flatMap { case (id, hs) =>
        Iterator.range(1, hs.length).map(i => (id, i.toLong, hs(i - 1), hs(i)))
      }.toDF("doc_id", "pos", "__h1", "__h2")
  }

  private def unigramFrame(docs: DataFrame, idCol: String, textCol: String) = {
    val spark = docs.sparkSession
    import spark.implicits._
    QualityFilters.tokenHashStream(docs, idCol, textCol)
      .flatMap(_._2.iterator).distinct().toDF("h")
  }

  def buildNgramStats(docs: DataFrame, idCol: String,
                      textCol: String): NgramStatsIndex = {
    val bg = bigramFrame(docs, idCol, textCol)
    NgramStatsIndex(
      bg.groupBy(col("__h1"), col("__h2")).agg(count(lit(1)).as("pc_part")),
      bg.groupBy(col("__h1")).agg(count(lit(1)).as("cc_part")),
      unigramFrame(docs, idCol, textCol),
      idFrame(docs, idCol))
  }

  /** Delta-cost fold: the delta's pair/context partials union in
    * (additive); its distinct unigrams union in un-deduplicated across
    * batches — vocabulary dedups once, at use time, over the compact
    * hash column instead of per-append. */
  def appendToNgramStats(ix: NgramStatsIndex, newDocs: DataFrame,
                         idCol: String, textCol: String): NgramStatsIndex = {
    Dedup.requireDeltaDisjoint(ix.ids, newDocs, idCol, "appendToNgramStats")
    val bg = bigramFrame(newDocs, idCol, textCol)
    NgramStatsIndex(
      ix.pairParts.select(col("__h1"), col("__h2"), col("pc_part"))
        .unionByName(bg.groupBy(col("__h1"), col("__h2"))
          .agg(count(lit(1)).as("pc_part"))),
      ix.contextParts.select(col("__h1"), col("cc_part"))
        .unionByName(bg.groupBy(col("__h1")).agg(count(lit(1)).as("cc_part"))),
      ix.unigrams.select(col("h"))
        .unionByName(unigramFrame(newDocs, idCol, textCol)),
      ix.ids.select(col("id")).unionByName(idFrame(newDocs, idCol)))
  }

  def saveNgramStats(ix: NgramStatsIndex, dir: String): Unit = {
    ix.pairParts.write.mode("overwrite").parquet(s"$dir/pairs")
    ix.contextParts.write.mode("overwrite").parquet(s"$dir/contexts")
    ix.unigrams.write.mode("overwrite").parquet(s"$dir/unigrams")
    ix.ids.write.mode("overwrite").parquet(s"$dir/ids")
  }

  def loadNgramStats(spark: SparkSession, dir: String): NgramStatsIndex =
    NgramStatsIndex(spark.read.parquet(s"$dir/pairs"),
      spark.read.parquet(s"$dir/contexts"),
      spark.read.parquet(s"$dir/unigrams"),
      spark.read.parquet(s"$dir/ids"))

  // ===================================================================
  // Streaming twins — the ArchiveDedup pattern radically simplified:
  // partial counts are ADDITIVE and ORDER-INDEPENDENT, so a streamed
  // archive needs no coverage manifests, no replay verification, no
  // generation machinery — each micro-batch overwrites its own
  // `batch_id=<id>` partition of partial-count parquet (idempotent by
  // construction: a replayed batch rewrites identical partials), and a
  // reader aggregates whatever partitions exist through ONE partitioned
  // relation. Periodic compaction is an optimization (fold partials
  // into one partition), never a correctness event.
  // ===================================================================

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def hfs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Commit one entry `dir/<name>/{<components>}` via write-to-temp +
    * rename (the ArchiveDedup commit discipline): the rename is the
    * single commit point, so a crash mid-write leaves only an invisible
    * `.inprogress-*` dir — never a torn entry whose count partials are
    * readable while the ids the replay guard keys on are missing. */
  private def commitComponents(spark: SparkSession, dir: String, name: String,
                               comps: Seq[(String, DataFrame)]): Unit = {
    val (fs, _) = hfs(spark, dir)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$name")))
      throw new IllegalStateException(
        s"CorpusStats: entry $dir/$name already exists with DIFFERENT " +
          "rows than this batch carries — the stream restarted without " +
          "its checkpointLocation and its batchId counter reset. " +
          "Refusing to double-commit; restart with the original checkpoint.")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/.inprogress-$name")
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale crash leftovers
    comps.foreach { case (c, df) =>
      df.write.mode("overwrite").parquet(s"$tmp/$c")
    }
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(s"$dir/$name")))
      throw new IllegalStateException(
        s"CorpusStats: failed to commit stats entry $dir/$name " +
          "(rename returned false) — is another writer racing this archive?")
  }

  private def commitParts(ix: TokenStatsIndex, dir: String, name: String): Unit =
    commitComponents(ix.parts.sparkSession, dir, name,
      Seq("df" -> ix.parts, "ids" -> ix.ids))

  private def entryNamesOf(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, p) = hfs(spark, dir)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith("."))
  }

  /** Seed a streamed token-stats archive (entry `seed`). */
  def seedTokenStatsArchive(corpus: DataFrame, dir: String, idCol: String,
                            textCol: String): Unit =
    commitParts(buildTokenStats(corpus, idCol, textCol), dir, "seed")

  /** The live archive: every committed entry's partials through ONE
    * multi-path relation per component (plan is O(1) in stream age,
    * like the dedup archives). */
  def loadTokenStatsArchive(spark: SparkSession, dir: String): TokenStatsIndex = {
    val entries = entryNamesOf(spark, dir)
    require(entries.nonEmpty,
      s"CorpusStats: no committed entries in $dir — seed or stream first")
    TokenStatsIndex(
      spark.read.parquet(entries.map(e => s"$dir/$e/df"): _*)
        .select(col("w"), col("tdf_part")),
      spark.read.parquet(entries.map(e => s"$dir/$e/ids"): _*)
        .select(col("id")))
  }

  /** One micro-batch: enforce the disjointness contract against the
    * archived id set, then COMMIT the batch's partial counts as entry
    * `b<id>` (temp + rename — atomic). Replay-safe: an existing entry
    * with the same ids skips; different ids under a committed batchId
    * is a restart WITHOUT the checkpoint (counter reset) and refuses
    * loudly — overwriting would silently REPLACE the old batch's
    * counts. */
  private[graft] def processTokenStatsBatch(batch: DataFrame, batchId: Long,
                                            dir: String, idCol: String,
                                            textCol: String): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col(idCol).cast("long").as(idCol), col(textCol))
      .localCheckpoint()
    if (alreadyFolded(spark, dir, batchId, b, idCol,
        () => loadTokenStatsArchive(spark, dir).ids)) return
    commitParts(buildTokenStats(b, idCol, textCol), dir, s"b$batchId")
  }

  /** Replay guard by ID-MEMBERSHIP, not entry presence — additive
    * counts admit a simpler and STRONGER coverage test than the dedup
    * archives' name/manifest machinery: batches carry disjoint doc
    * ids, so a batch whose ids are ALL already archived was folded
    * (wherever its entry now lives — including after an out-of-band
    * compaction folded it away), one with NONE archived is fresh (the
    * coverage test IS the disjointness guard), and a PARTIAL overlap
    * can only mean corruption or a foreign corpus — refuse loudly.
    * Counter resets (restart without checkpoint) that pass this test
    * (fresh docs under a used batchId) are caught at commit time by
    * the existing-entry check in [[commitComponents]]. */
  private def alreadyFolded(spark: SparkSession, dir: String, batchId: Long,
                            b: DataFrame, idCol: String,
                            archivedIds: () => DataFrame): Boolean = {
    if (entryNamesOf(spark, dir).isEmpty) return false // day-0 stream
    val incoming = b.select(col(idCol).cast("long").as("id")).distinct()
      .localCheckpoint()
    val n = incoming.count()
    if (n == 0) return true // empty batch: nothing to fold, skip
    val present = incoming.join(archivedIds(), Seq("id")).count()
    if (present == 0) false
    else if (present == n) {
      log.warn(s"CorpusStats: batch $batchId's ids are all archived in " +
        s"$dir — skipping as a replay. If this stream restarted WITHOUT " +
        "its checkpointLocation this skip may mask a counter reset; " +
        "always restart with the original checkpoint.")
      true
    } else
      throw new IllegalStateException(
        s"CorpusStats: batch $batchId overlaps the archive in $dir on " +
          s"$present of $n ids — a partial fold can only be corruption " +
          "or a foreign corpus (batches must carry disjoint doc ids). " +
          "Refusing to double-count; restart with the original " +
          "checkpoint, or point the stream at a fresh archive.")
  }

  /** Streaming sink: maintain the token-stats archive from a document
    * stream — [[tokenFrequencyMetricsAgainst]] over
    * [[loadTokenStatsArchive]] then scores any frame against the
    * cumulative corpus without re-reading its text. */
  def tokenStatsSink(docs: DataFrame, dir: String, idCol: String,
                     textCol: String,
                     checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    if (checkpoint.isEmpty)
      log.warn("CorpusStats.tokenStatsSink started WITHOUT a " +
        "checkpointLocation: on restart Structured Streaming resets " +
        "batchId to 0, which this archive will detect and REFUSE (loud " +
        "failure instead of silently replacing a batch's counts) — pass " +
        "checkpoint = Some(dir) for restartable streams.")
    val w = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processTokenStatsBatch(batch, batchId, dir, idCol, textCol)
      }
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  /** Fold every entry's partials into one — file-count hygiene for
    * long streams (one entry accrues per batch; reads stay a single
    * multi-path relation either way). Reads are equivalent before and
    * after, and REPLAYS stay safe across it: the guard tests
    * id-membership, not entry presence, so a batch whose entry was
    * folded away still skips. Run out-of-band into a fresh dir, then
    * repoint the stream. */
  def compactTokenStatsArchive(spark: SparkSession, dir: String,
                               dstDir: String): Unit = {
    val ix = loadTokenStatsArchive(spark, dir)
    commitParts(TokenStatsIndex(
      ix.parts.groupBy(col("w")).agg(sum(col("tdf_part")).as("tdf_part")),
      ix.ids.select(col("id")).distinct()), dstDir, "seed")
  }

  // ---- the ngram twin: identical machinery, four components ----

  private def commitNgram(ix: NgramStatsIndex, dir: String, name: String): Unit =
    commitComponents(ix.pairParts.sparkSession, dir, name,
      Seq("pairs" -> ix.pairParts, "contexts" -> ix.contextParts,
        "unigrams" -> ix.unigrams, "ids" -> ix.ids))

  /** Seed a streamed bigram-stats archive (entry `seed`). */
  def seedNgramStatsArchive(corpus: DataFrame, dir: String, idCol: String,
                            textCol: String): Unit =
    commitNgram(buildNgramStats(corpus, idCol, textCol), dir, "seed")

  def loadNgramStatsArchive(spark: SparkSession, dir: String): NgramStatsIndex = {
    val entries = entryNamesOf(spark, dir)
    require(entries.nonEmpty,
      s"CorpusStats: no committed entries in $dir — seed or stream first")
    def comp(c: String, cols: Seq[String]) =
      spark.read.parquet(entries.map(e => s"$dir/$e/$c"): _*)
        .select(cols.map(col): _*)
    NgramStatsIndex(
      comp("pairs", Seq("__h1", "__h2", "pc_part")),
      comp("contexts", Seq("__h1", "cc_part")),
      comp("unigrams", Seq("h")),
      comp("ids", Seq("id")))
  }

  private[graft] def processNgramStatsBatch(batch: DataFrame, batchId: Long,
                                            dir: String, idCol: String,
                                            textCol: String): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col(idCol).cast("long").as(idCol), col(textCol))
      .localCheckpoint()
    if (alreadyFolded(spark, dir, batchId, b, idCol,
        () => loadNgramStatsArchive(spark, dir).ids)) return
    commitNgram(buildNgramStats(b, idCol, textCol), dir, s"b$batchId")
  }

  /** Streaming sink for the bigram-LM statistics —
    * [[bigramCountsAgainst]] over [[loadNgramStatsArchive]] then scores
    * any covered frame against the cumulative model. */
  def ngramStatsSink(docs: DataFrame, dir: String, idCol: String,
                     textCol: String,
                     checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    if (checkpoint.isEmpty)
      log.warn("CorpusStats.ngramStatsSink started WITHOUT a " +
        "checkpointLocation: on restart Structured Streaming resets " +
        "batchId to 0, which this archive will detect and REFUSE — pass " +
        "checkpoint = Some(dir) for restartable streams.")
    val w = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processNgramStatsBatch(batch, batchId, dir, idCol, textCol)
      }
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  /** Bigram-LM counts of `target`'s bigram positions against the
    * INDEX's model — [[QualityFilters.bigramCounts]]' exact-integer
    * shape (doc_id, pos, pair_count, context_count, vocab_size), equal
    * to the batch operator over the index's corpus when the index
    * covers `target` (q92 gates this through q79's oracle). The daily
    * regime: score today's delta under cumulative corpus counts with
    * one tokenize pass over the DELTA plus two narrow-key aggregates
    * over the archived partials. Same coverage contract as
    * [[tokenFrequencyMetricsAgainst]]: a target bigram the index has
    * never seen has no counts and its (doc_id, pos) row is DROPPED
    * (inner join) — fold the target first, or accept seen-bigram rows
    * for an uncovered frame (perplexity consumers wanting
    * smoothing-floor rows for unseen bigrams should use
    * [[QualityFilters.bigramLmScoresAgainst]]'s left-join regime). */
  def bigramCountsAgainst(ix: NgramStatsIndex, target: DataFrame,
                          idCol: String, textCol: String): DataFrame = {
    val c2 = ix.pairParts.groupBy(col("__h1"), col("__h2"))
      .agg(sum(col("pc_part")).as("pair_count"))
    val c1 = ix.contextParts.groupBy(col("__h1"))
      .agg(sum(col("cc_part")).as("context_count"))
    val vocab = ix.unigrams.select(col("h")).distinct().count()
    bigramFrame(target, idCol, textCol)
      .join(c2, Seq("__h1", "__h2"))
      .join(c1, Seq("__h1"))
      .select(col("doc_id"), col("pos"), col("pair_count"),
        col("context_count"), lit(vocab).as("vocab_size"))
  }
}
