package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Parquet-backed document collections — the engine's storage layer standing
 * in for Chroma collections (S15, day_7/chroma_vector_db.py:74-130) and the
 * pgvector table-per-collection scheme (S16,
 * day_9/database/vector_ops.py:39-131).
 *
 * Upsert follows the reference's `INSERT ... ON CONFLICT DO UPDATE`
 * semantics via union + latest-wins compaction: at scale this is one
 * shuffle on the id (and the periodic rewrite is amortized the way log-
 * structured stores do it); point reads are parquet scans with pushed id
 * predicates.
 */
object CollectionStore {

  def path(root: String, collection: String): String = s"$root/collections/$collection"

  def write(df: DataFrame, root: String, collection: String): Unit =
    df.write.mode("overwrite").parquet(path(root, collection))

  def read(spark: SparkSession, root: String, collection: String): DataFrame =
    spark.read.parquet(path(root, collection))

  /** Latest-wins merge of `updates` into `existing` on `idCol`, versioned
    * by `versionCol` (higher wins; updates win ties). */
  def upsert(existing: DataFrame, updates: DataFrame,
             idCol: String, versionCol: String): DataFrame = {
    val tagged = existing.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(versionCol).desc, col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** Point lookup (P6): `get(ids)` → pushed-down id filter. */
  def get(df: DataFrame, idCol: String, ids: Seq[Any]): DataFrame =
    df.where(col(idCol).isin(ids: _*))

  /** Delete by ids (day_8 delete endpoint): anti-filter. */
  def delete(df: DataFrame, idCol: String, ids: Seq[Any]): DataFrame =
    df.where(!col(idCol).isin(ids: _*))

  /** Collection stats (A1 — day_9 get_collection_stats SQL function). */
  def stats(df: DataFrame, contentCol: String, tsCol: Option[String] = None): DataFrame = {
    val base = Seq(
      count(lit(1)).as("total_documents"),
      avg(length(col(contentCol))).as("avg_content_length"))
    val temporal = tsCol.toSeq.flatMap(c =>
      Seq(min(col(c)).as("earliest"), max(col(c)).as("latest")))
    df.agg((base ++ temporal).head, (base ++ temporal).tail: _*)
  }
}
