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
