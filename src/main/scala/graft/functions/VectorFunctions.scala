package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

/**
 * Column-API and SQL surface for the vector expressions — the Spark-native
 * equivalent of pgvector's `<=>` / `<->` / `<#>` operators
 * (reference day_9/database/vector_ops.py:142-152).
 */
object VectorFunctions {
  def dotProduct(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))
  def cosineSimilarity(a: Column, b: Column): Column = toCol(CosineSimilarity(toExpr(a), toExpr(b)))
  /** pgvector `<=>`: 1 − cosine. */
  def cosineDistance(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.lit(1.0) - cosineSimilarity(a, b)
  def l2Distance(a: Column, b: Column): Column = toCol(L2Distance(toExpr(a), toExpr(b)))
  /** pgvector `<#>` returns the NEGATIVE inner product. */
  def negInnerProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.lit(0.0) - dotProduct(a, b)
  def l2Norm(a: Column): Column = toCol(L2Norm(toExpr(a)))
  def l2Normalize(a: Column): Column = toCol(L2Normalize(toExpr(a)))

  /** Reciprocal distance→similarity: 1/(1+d) (F4 variant 2 —
    * day_10/embedders/embedding_pipeline.py:189-192, day_14/src/main.py:94). */
  def l2Similarity(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.lit(1.0) /
      (org.apache.spark.sql.functions.lit(1.0) + l2Distance(a, b))

  /** Max-normalized distance→similarity: 1 − d/maxD, where maxD is a
    * global aggregate supplied by the caller (F4 variant 1 —
    * day_5/day5_complete.py:105-113 computes max over the batch first). */
  def l2SimilarityMaxNorm(a: Column, b: Column, maxDist: Column): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    when(maxDist > 0, lit(1.0) - l2Distance(a, b) / maxDist).otherwise(lit(1.0))
  }

  /** Register SQL names so `spark.sql("SELECT cosine_similarity(a,b) ...")` works. */
  def registerAll(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("cosine_similarity", es => CosineSimilarity(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("l2_distance", es => L2Distance(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("l2_norm", es => L2Norm(es.head), "scala_udf")
    r.createOrReplaceTempFunction("l2_normalize", es => L2Normalize(es.head), "scala_udf")
  }
}
