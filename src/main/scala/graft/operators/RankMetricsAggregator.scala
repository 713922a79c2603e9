package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * SURVEY §2.11's UDAF tier: the ordered-list IR metrics (AP numerator,
 * reciprocal rank, DCG) as a typed `Aggregator`. The window formulation in
 * [[IREval]] is the primary (and oracle-checked) path; this is the
 * equivalent single-pass aggregate for callers that prefer
 * `ds.groupByKey(...).agg(...)` shape — buffer collects (rank, isRel)
 * pairs (bounded by the retrieved-list length), finish sorts once and
 * folds the ordered metrics.
 */
object RankMetricsAggregator {

  /** (apNum, rr, dcg@k, relRetrievedAtK, nTopK) per query. */
  case class RankMetrics(ap_num: Double, rr: Double, dcg: Double,
                         rel_ret: Long, n_top: Long)

  def apply(k: Int): Aggregator[(Int, Boolean), List[(Int, Boolean)], RankMetrics] =
    new Aggregator[(Int, Boolean), List[(Int, Boolean)], RankMetrics] {
      override def zero: List[(Int, Boolean)] = Nil
      override def reduce(b: List[(Int, Boolean)], a: (Int, Boolean)): List[(Int, Boolean)] = a :: b
      override def merge(x: List[(Int, Boolean)], y: List[(Int, Boolean)]): List[(Int, Boolean)] = x ::: y
      override def finish(buf: List[(Int, Boolean)]): RankMetrics = {
        val sorted = buf.sortBy(_._1)
        var relCum = 0L
        var apNum = 0.0
        var rr = 0.0
        var dcg = 0.0
        var relRet = 0L
        var nTop = 0L
        sorted.foreach { case (rank, isRel) =>
          if (rank <= k) nTop += 1
          if (isRel) {
            relCum += 1
            apNum += relCum.toDouble / rank
            if (rr == 0.0) rr = 1.0 / rank
            if (rank <= k) {
              relRet += 1
              dcg += 1.0 / (math.log(rank + 1.0) / math.log(2.0))
            }
          }
        }
        RankMetrics(apNum, rr, dcg, relRet, nTop)
      }
      override def bufferEncoder: Encoder[List[(Int, Boolean)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      override def outputEncoder: Encoder[RankMetrics] = Encoders.product[RankMetrics]
    }

  /** Per-query metrics through the Aggregator (same inputs/semantics as
    * [[IREval.perQuery]]'s window form — cross-checked in tests). */
  def perQuery(retrieved: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val spark = retrieved.sparkSession
    import spark.implicits._
    val rel = truth.select(col("query_id"), col("doc_id"), lit(1).as("is_rel"))
    val nRel = truth.groupBy(col("query_id").cast("string").as("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    val joined = retrieved
      .join(rel, Seq("query_id", "doc_id"), "left")
      .na.fill(0, Seq("is_rel"))
      .select(col("query_id").cast("string"), col("rank").cast("int"),
        (col("is_rel") === 1).as("is_rel"))
      .as[(String, Int, Boolean)]
    val agg = RankMetricsAggregator(k).toColumn
    val perQ = joined
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("m"))
      .toDF("query_id", "m")
      .select(col("query_id"), col("m.*"))
    perQ.join(nRel, Seq("query_id"))
      .select(col("query_id"),
        when(col("n_top") > 0, col("rel_ret").cast("double") / col("n_top")).otherwise(0.0).as("precision"),
        when(col("n_rel") > 0, col("rel_ret").cast("double") / col("n_rel")).otherwise(0.0).as("recall"),
        when(col("n_rel") > 0, col("ap_num") / col("n_rel")).otherwise(0.0).as("ap"),
        col("rr"),
        col("dcg"))
  }
}
