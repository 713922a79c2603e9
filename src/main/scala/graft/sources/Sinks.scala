package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Export sinks (SURVEY §2.1 S6–S8) and ground-truth loading (S17).
 * The reference's .npy/.npz/pickle persistence (S4–S6) maps wholesale to
 * parquet (`CollectionStore`); these cover the remaining CSV/JSON shapes.
 */
object Sinks {

  /** Embeddings → CSV with one column per dimension (S7,
    * day_10/embedders/embedding_pipeline.py:355-377: `embed_j` columns). */
  def embeddingsToCsv(df: DataFrame, idCol: String, vecCol: String,
                      dim: Int, path: String): Unit = {
    val cols = col(idCol) +: (0 until dim).map(i =>
      element_at(col(vecCol), i + 1).as(s"embed_$i"))
    df.select(cols: _*)
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  /** Read back the S7 CSV into (id, vector) form (inverse mapping). */
  def embeddingsFromCsv(spark: SparkSession, path: String, idCol: String): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    val dims = raw.columns.filter(_.startsWith("embed_"))
      .sortBy(_.stripPrefix("embed_").toInt)
    raw.select(col(idCol),
      array(dims.map(c => col(c).cast("float")): _*).as("embedding"))
  }

  /** Results / report JSON sink (S8). */
  def toJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /**
   * Ground-truth loader (S17, day_13/src/main.py:100-124): a JSON file of
   * {"documents": [...]} and {"queries": [{id, text, relevant_doc_ids}]}
   * split into a documents frame and a (query_id, doc_id) relevance-pair
   * frame (the IREval input shape).
   */
  def loadGroundTruth(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val root = spark.read.option("multiLine", "true").json(path)
    val docs = root.select(explode(col("documents")).as("d"))
      .select(col("d.id").as("doc_id"), col("d.content").as("content"))
    val queries = root.select(explode(col("queries")).as("q"))
      .select(col("q.id").as("query_id"),
        col("q.text").as("text"),
        explode(col("q.relevant_doc_ids")).as("doc_id"))
      .select(col("query_id"), col("doc_id"))
    (docs, queries)
  }
}
