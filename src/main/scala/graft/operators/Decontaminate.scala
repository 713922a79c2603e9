package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination — the training-data pipeline step that
 * removes evaluation-set leakage before training: a training document
 * is CONTAMINATED if it shares any word n-gram with a benchmark
 * document (the n-gram-overlap rule used by GPT-3/PaLM-style data
 * cards; n defaults to the production 8, callers tune per corpus).
 *
 * Shape at scale: the benchmark side is tiny next to a 100 TB training
 * corpus, so its distinct n-gram set broadcasts and the training side
 * streams through one codegen'd explode → broadcast-hash semi-join —
 * no shuffle of training data at all. Per-doc grams are de-duplicated
 * BEFORE the join (`array_distinct`) so a gram repeated inside one
 * document can't inflate the candidate stream.
 *
 * The broadcast is BOUNDED (round 8): a pathological benchmark (someone
 * passes a corpus as the "benchmark") must not OOM the driver, so the
 * gram volume is estimated first from a cheap word-count scan — an
 * overestimate of the distinct gram count, conservative in the safe
 * direction — and past `maxBroadcastGrams` the join degrades to a
 * shuffled hash join on the gram key (documented fallback: both sides
 * shuffle on the gram, the benchmark side builds the hash map; same
 * rows, one extra exchange of the candidate stream).
 */
object Decontaminate {

  private def grams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val ws = graft.functions.TextFunctions.wordTokens(lower(col(textCol)))
    val gs = when(size(ws) >= n,
      array_distinct(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
    // gram construction is compute-bound: widen a narrow file scan so the
    // training side doesn't shingle on one core (no-op at corpus scale)
    Par.widen(df).select(col(idCol), explode(gs).as("gram"))
  }

  /** Contaminated training docs: `(idCol, n_shared)` — the count of
    * DISTINCT n-grams each shares with the benchmark set.
    * `maxBroadcastGrams` caps the driver-collected side (~8-gram rows
    * average ≈100 bytes; the 5M default bounds the broadcast around
    * half a GB); a larger benchmark routes to the shuffle fallback. */
  def contaminated(train: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String, n: Int = 8,
                   maxBroadcastGrams: Long = 5000000L): DataFrame = {
    val benchGrams = grams(benchmark, idCol, textCol, n)
      .select(col("gram")).distinct()
    // cheap upper bound on the gram count: total words (≥ grams per doc,
    // ≥ distinct grams) — one narrow scan, no gram strings built, and an
    // overestimate can only choose the safe (shuffle) route
    val estimate = benchmark
      .agg(sum(size(graft.functions.TextFunctions.wordTokens(
        lower(col(textCol))))).as("w"))
      .head().getAs[Number](0) match { case null => 0L; case x => x.longValue() }
    val bench =
      if (estimate <= maxBroadcastGrams) broadcast(benchGrams)
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"decontaminate: benchmark word count $estimate exceeds " +
            s"maxBroadcastGrams=$maxBroadcastGrams — falling back to a " +
            s"shuffled hash join on the gram key (no driver broadcast)")
        benchGrams.hint("shuffle_hash")
      }
    // both sides are already distinct (per-doc array_distinct on train,
    // .distinct() on bench), so the join emits one row per (doc, gram) —
    // a plain count equals count-distinct without the extra dedup
    // aggregate exchange
    grams(train, idCol, textCol, n)
      .join(bench, Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The transform: training set minus contaminated docs (anti-join). */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, n: Int = 8,
                    maxBroadcastGrams: Long = 5000000L): DataFrame =
    train.join(
      contaminated(train, benchmark, idCol, textCol, n, maxBroadcastGrams)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
