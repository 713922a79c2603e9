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
    * DISTINCT n-grams each shares with the benchmark set. */
  def contaminated(train: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val bench = broadcast(grams(benchmark, idCol, textCol, n)
      .select(col("gram")).distinct())
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
                    idCol: String, textCol: String, n: Int = 8): DataFrame =
    train.join(contaminated(train, benchmark, idCol, textCol, n).select(col(idCol)),
      Seq(idCol), "left_anti")
}
