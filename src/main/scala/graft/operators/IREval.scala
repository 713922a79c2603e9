package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * IR evaluation engine (SURVEY §2.4 A7, §2.5 W3) mirroring the reference's
 * exact semantics (day_13/src/main.py:126-237):
 *
 *  - precision@k = |rel ∩ top_k| / |top_k|     (|top_k| may be < k)
 *  - recall@k    = |rel ∩ top_k| / |relevant|
 *  - f1@k        = harmonic mean of the two
 *  - AP          = Σ_{i: retrieved_i relevant} (relCount(i)/i) / |relevant|
 *                  over the FULL retrieved list (not top-k)
 *  - RR          = 1/first relevant position over the full list
 *  - NDCG@k      = binary DCG@k / IDCG with min(|relevant|, k) ideal slots
 *  - hitRate@k   = 1 iff any relevant in top_k
 *
 * Everything is windows + grouped aggregation — one shuffle on query_id,
 * partial-aggregated map-side; no per-query driver loops, so it scales to
 * any number of queries.
 */
object IREval {

  /**
   * Per-query metrics at cutoff k.
   *
   * @param retrieved (query_id, doc_id, rank) — rank 1-based over the full
   *                  retrieved list, ties already broken deterministically
   * @param truth     (query_id, doc_id) relevant pairs
   */
  def perQuery(retrieved: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val rel = truth.select(col("query_id"), col("doc_id"), lit(1).as("is_rel"))
    val nRel = truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))

    val joined = retrieved
      .join(rel, Seq("query_id", "doc_id"), "left")
      .na.fill(0, Seq("is_rel"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val withCum = joined.withColumn("rel_cum", sum(col("is_rel")).over(w))

    val inTopK = col("rank") <= k
    val isRel = col("is_rel") === 1
    val agg = withCum.groupBy(col("query_id")).agg(
      sum(when(isRel && inTopK, 1).otherwise(0)).as("rel_ret"),
      sum(when(inTopK, 1).otherwise(0)).as("n_top"),
      sum(when(isRel, col("rel_cum").cast("double") / col("rank"))).as("ap_num"),
      min(when(isRel, col("rank"))).as("first_rel"),
      sum(when(isRel && inTopK, lit(1.0) / log2(col("rank") + 1))).as("dcg"))

    // guard n_rel = 0: sequence(1, 0) would count DOWN and divide by log2(1)
    val idcg = when(col("n_rel") > 0, aggregate(
      sequence(lit(1), least(col("n_rel"), lit(k))), lit(0.0),
      (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1))).otherwise(0.0)

    val precision = when(col("n_top") > 0, col("rel_ret").cast("double") / col("n_top")).otherwise(0.0)
    val recall = when(col("n_rel") > 0, col("rel_ret").cast("double") / col("n_rel")).otherwise(0.0)

    // left join: a query whose relevant set is empty (no truth rows) still
    // evaluates — with zero metrics, like the reference — instead of
    // vanishing from the output and skewing macro averages / n_queries
    agg.join(nRel, Seq("query_id"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("precision", precision)
      .withColumn("recall", recall)
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2) * col("precision") * col("recall") / (col("precision") + col("recall")))
          .otherwise(0.0))
      .withColumn("ap",
        when(col("n_rel") > 0, coalesce(col("ap_num"), lit(0.0)) / col("n_rel")).otherwise(0.0))
      .withColumn("rr",
        when(col("first_rel").isNotNull, lit(1.0) / col("first_rel")).otherwise(0.0))
      .withColumn("idcg", idcg)
      .withColumn("ndcg",
        when(col("idcg") > 0, coalesce(col("dcg"), lit(0.0)) / col("idcg")).otherwise(0.0))
      .withColumn("hit_rate", when(col("rel_ret") > 0, 1.0).otherwise(0.0))
      .select(col("query_id"), col("precision"), col("recall"), col("f1"),
        col("ap"), col("rr"), col("ndcg"), col("hit_rate"))
  }

  /** Macro averages over queries (the reference's evaluate_batch means). */
  def summary(retrieved: DataFrame, truth: DataFrame, k: Int): DataFrame =
    perQuery(retrieved, truth, k).agg(
      count(lit(1)).as("n_queries"),
      avg(col("precision")).as("precision"),
      avg(col("recall")).as("recall"),
      avg(col("f1")).as("f1"),
      avg(col("ap")).as("map"),
      avg(col("rr")).as("mrr"),
      avg(col("ndcg")).as("ndcg"),
      avg(col("hit_rate")).as("hit_rate"))

  /**
   * Multi-k sweep (reference evaluate_at_multiple_k) — one row per k.
   *
   * Single-pass: the retrieved⋈truth join, the cumulative-relevance
   * window, and the per-query groupBy run ONCE with k-suffixed
   * conditional aggregates (`when(rank <= k, …)` per k), instead of once
   * per k — the per-k branches then only macro-average the tiny per-query
   * frame. Formulas mirror [[perQuery]] expression-for-expression so the
   * results are bit-identical to the per-k path.
   */
  def sweep(retrieved: DataFrame, truth: DataFrame, ks: Seq[Int]): DataFrame = {
    val rel = truth.select(col("query_id"), col("doc_id"), lit(1).as("is_rel"))
    val nRel = truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val joined = retrieved
      .join(rel, Seq("query_id", "doc_id"), "left")
      .na.fill(0, Seq("is_rel"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val withCum = joined.withColumn("rel_cum", sum(col("is_rel")).over(w))
    val isRel = col("is_rel") === 1

    val kAggs = ks.flatMap { k =>
      val inTopK = col("rank") <= k
      Seq(
        sum(when(isRel && inTopK, 1).otherwise(0)).as(s"rel_ret_$k"),
        sum(when(inTopK, 1).otherwise(0)).as(s"n_top_$k"),
        sum(when(isRel && inTopK, lit(1.0) / log2(col("rank") + 1))).as(s"dcg_$k"))
    }
    val shared = Seq(
      sum(when(isRel, col("rel_cum").cast("double") / col("rank"))).as("ap_num"),
      min(when(isRel, col("rank"))).as("first_rel"))
    val allAggs = kAggs ++ shared
    val base = withCum.groupBy(col("query_id"))
      .agg(allAggs.head, allAggs.tail: _*)
      .join(nRel, Seq("query_id"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))

    val perK = ks.map { k =>
      val idcg = when(col("n_rel") > 0, aggregate(
        sequence(lit(1), least(col("n_rel"), lit(k))), lit(0.0),
        (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1))).otherwise(0.0)
      val precision = when(col(s"n_top_$k") > 0,
        col(s"rel_ret_$k").cast("double") / col(s"n_top_$k")).otherwise(0.0)
      val recall = when(col("n_rel") > 0,
        col(s"rel_ret_$k").cast("double") / col("n_rel")).otherwise(0.0)
      base
        .withColumn("precision", precision)
        .withColumn("recall", recall)
        .withColumn("f1",
          when(col("precision") + col("recall") > 0,
            lit(2) * col("precision") * col("recall") / (col("precision") + col("recall")))
            .otherwise(0.0))
        .withColumn("ap",
          when(col("n_rel") > 0, coalesce(col("ap_num"), lit(0.0)) / col("n_rel")).otherwise(0.0))
        .withColumn("rr",
          when(col("first_rel").isNotNull, lit(1.0) / col("first_rel")).otherwise(0.0))
        .withColumn("idcg", idcg)
        .withColumn("ndcg",
          when(col("idcg") > 0, coalesce(col(s"dcg_$k"), lit(0.0)) / col("idcg")).otherwise(0.0))
        .withColumn("hit_rate", when(col(s"rel_ret_$k") > 0, 1.0).otherwise(0.0))
        .agg(
          count(lit(1)).as("n_queries"),
          avg(col("precision")).as("precision"),
          avg(col("recall")).as("recall"),
          avg(col("f1")).as("f1"),
          avg(col("ap")).as("map"),
          avg(col("rr")).as("mrr"),
          avg(col("ndcg")).as("ndcg"),
          avg(col("hit_rate")).as("hit_rate"))
        .withColumn("k", lit(k))
    }
    perK.reduce(_ unionByName _)
      .select(col("k"), col("n_queries"), col("precision"), col("recall"),
        col("f1"), col("map"), col("mrr"), col("ndcg"), col("hit_rate"))
  }

  /** Recall of an approximate result set vs the exact oracle (J5/A8 —
    * day_6's recall@k scoring of ANN indexes against FlatL2). */
  def recallVsExact(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = approx.join(exact, Seq("query_id", "doc_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    val totals = exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
    totals.join(hits, Seq("query_id"), "left")
      .na.fill(0, Seq("n_hit"))
      .select(col("query_id"),
        (col("n_hit").cast("double") / col("n_exact")).as("recall"))
  }
}
