package graft

import graft.operators.KnnSearch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val q = Tables.queryVector(spark, dir, 0L)
    KnnSearch.topK(
      Tables(spark, dir, "embeddings").where(col("vec_id") =!= 0),
      "vec_id", "embedding", q, k = 10, KnnSearch.Cosine)
  }

  // ---- oracle-parity helpers -----------------------------------------
  // The driver hashes result values after sorting columns by name; floats
  // must therefore be bit-identical with DuckDB. Strategy:
  //  * money sums go through DECIMAL (exact, order-independent), then are
  //    rounded and cast back to double;
  //  * unit-scale doubles (similarities, ratios) are computed sequentially
  //    in double on both sides and rounded to 6 dp;
  //  * every query has a deterministic total ORDER BY.
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private def sumMoney(c: Column, as: String): Column =
    round(sum(dec2(c)), 2).cast("double").as(as)

  private type Q = (SparkSession, String) => DataFrame

  // =====================================================================
  // Relational / TPC-H-flavored coverage (SURVEY §2.2/§2.3/§2.4/§2.5)
  // =====================================================================

  /** A1-style grouped aggregation over the biggest table (pricing summary). */
  private val q01PricingSummary: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    li.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice"), "sum_base_price"),
        round(sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) - dec2(col("l_discount")))), 2)
          .cast("double").as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1)), 6).as("avg_price"),
        round(sum(dec2(col("l_discount"))).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Broadcast equi-join + grouped agg + top-k (J4/A6/W2 shapes). */
  private val q02TopRevenueParts: Q = (s, dir) => {
    val li = Tables(s, dir, "lineitem")
    val part = Tables(s, dir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(4, 2)) - dec2(col("l_discount")))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("p_brand"))
      .limit(10)
  }

  /** Customer×orders join with per-segment stats (A1/A10 shape). */
  private val q03SegmentStats: Q = (s, dir) => {
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sumMoney(col("o_totalprice"), "total_revenue"),
        round(sum(dec2(col("o_totalprice"))).cast("double") / count(lit(1)), 6).as("avg_order_value"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Window ranking: top-3 orders per customer by price (W1 pattern on relational data). */
  private val q04TopOrdersPerCustomer: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val o = Tables(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .where(col("o_custkey") < 100)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        dec2(col("o_totalprice")).cast("double").as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  // =====================================================================
  // Vector search (SURVEY §2.3 J1/J2, §2.5 W1/W2, §2.8 F1–F5)
  // =====================================================================

  /** Flagship k-NN: cosine top-10 for one stored query vector (J1/W1). */
  private val q10KnnCosine: Q = (s, dir) => {
    val q = Tables.queryVector(s, dir, 0L)
    KnnSearch.topK(Tables(s, dir, "embeddings").where(col("vec_id") =!= 0),
        "vec_id", "embedding", q, 10, KnnSearch.Cosine)
      .select(col("vec_id"), round(col("score"), 6).as("sim"))
  }

  /** k-NN under L2 distance (pgvector `<->`). */
  private val q11KnnL2: Q = (s, dir) => {
    val q = Tables.queryVector(s, dir, 1L)
    KnnSearch.topK(Tables(s, dir, "embeddings").where(col("vec_id") =!= 1),
        "vec_id", "embedding", q, 10, KnnSearch.L2)
      .select(col("vec_id"), round(col("score"), 6).as("dist"))
  }

  /** k-NN under inner product (pgvector `<#>`). */
  private val q12KnnDot: Q = (s, dir) => {
    val q = Tables.queryVector(s, dir, 2L)
    KnnSearch.topK(Tables(s, dir, "embeddings").where(col("vec_id") =!= 2),
        "vec_id", "embedding", q, 10, KnnSearch.InnerProduct)
      .select(col("vec_id"), round(col("score"), 6).as("ip"))
  }

  // =====================================================================
  // Documents / text (SURVEY §2.4 A1–A6)
  // =====================================================================

  /** Collection stats (A1: reference day_9 get_collection_stats). */
  private val q20DocStats: Q = (s, dir) => {
    Tables(s, dir, "documents").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      round(avg(col("n_chars")), 6).as("avg_chars"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"))
  }

  /** Grouped distribution (A6). */
  private val q21LangDistribution: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 6).as("avg_chars"))
      .orderBy(col("lang"))
  }

  // =====================================================================

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_top_revenue_parts" -> q02TopRevenueParts,
    "q03_segment_stats" -> q03SegmentStats,
    "q04_top_orders_per_customer" -> q04TopOrdersPerCustomer,
    "q10_knn_cosine" -> q10KnnCosine,
    "q11_knn_l2" -> q11KnnL2,
    "q12_knn_dot" -> q12KnnDot,
    "q20_doc_stats" -> q20DocStats,
    "q21_lang_distribution" -> q21LangDistribution,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_top_revenue_parts" ->
      """SELECT p_brand,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY revenue DESC, p_brand
        |LIMIT 10""".stripMargin,
    "q03_segment_stats" ->
      """SELECT c_mktsegment,
        |  count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_revenue,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_order_value,
        |  count(DISTINCT o_custkey) AS n_customers
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q04_top_orders_per_customer" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 AND o_custkey < 100
        |ORDER BY o_custkey, rn""".stripMargin,
    "q10_knn_cosine" ->
      """SELECT b.vec_id,
        |  round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS sim
        |FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE b.vec_id <> 0
        |ORDER BY list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC, b.vec_id
        |LIMIT 10""".stripMargin,
    "q11_knn_l2" ->
      """SELECT b.vec_id,
        |  round(list_distance(CAST(b.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS dist
        |FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 1) q
        |WHERE b.vec_id <> 1
        |ORDER BY list_distance(CAST(b.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) ASC, b.vec_id
        |LIMIT 10""".stripMargin,
    "q12_knn_dot" ->
      """SELECT b.vec_id,
        |  round(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS ip
        |FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 2) q
        |WHERE b.vec_id <> 2
        |ORDER BY list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) DESC, b.vec_id
        |LIMIT 10""".stripMargin,
    "q20_doc_stats" ->
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT source) AS n_sources,
        |  round(avg(n_chars), 6) AS avg_chars,
        |  min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars
        |FROM documents""".stripMargin,
    "q21_lang_distribution" ->
      """SELECT lang, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
  )
}
