package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Text → embedding operators (SURVEY §2.8 F23 — "the one true black-box
 * UDF"). The model call is a `mapPartitions` with internal batching, the
 * exact executor shape a real ONNX/JNI encoder needs (batch the partition's
 * rows, one forward pass per batch). The default implementation is the
 * deterministic mock the reference itself ships for tests
 * (day_10/embedders/embedding_pipeline.py:460-492, day_14/src/main.py:4-18):
 * seeded-hash gaussian, L2-normalized.
 */
object Embedder {

  /** Pluggable encoder: a batch of texts → one vector per text. */
  trait TextEncoder extends Serializable {
    def dim: Int
    def encodeBatch(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Deterministic mock encoder: md5(text)-seeded gaussian → L2 normalize. */
  case class MockEncoder(dim: Int = 64) extends TextEncoder {
    def encodeBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val seed = java.nio.ByteBuffer.wrap(
        java.security.MessageDigest.getInstance("MD5")
          .digest(if (t == null) Array.empty[Byte] else t.getBytes("UTF-8"))).getLong
      val rng = new java.util.Random(seed)
      val v = Array.fill(dim)(rng.nextGaussian().toFloat)
      val norm = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x)).toFloat
      if (norm == 0f) v else v.map(_ / norm)
    }
  }

  /**
   * Embed a text column: mapPartitions with `batchSize` batching (the
   * reference encodes in batches of 32 — day_10 embedding_pipeline:105-119).
   * Output: input columns + `embedding`.
   */
  def embed(df: DataFrame, idCol: String, textCol: String,
            encoder: TextEncoder = MockEncoder(), batchSize: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val vecs = encoder.encodeBatch(batch.map(_._2))
          batch.zip(vecs).map { case ((id, text), v) => (id, text, v) }
        }
      }
      .toDF(idCol, textCol, "embedding")
  }

  /**
   * Incremental embedding with cache reuse — the Spark form of the
   * reference's md5 content cache (day_10 embedding_pipeline:238-314):
   * anti-join new docs against the cached collection on the content
   * fingerprint, embed only the misses, union with the hits.
   */
  def embedIncremental(newDocs: DataFrame, cached: DataFrame,
                       idCol: String, textCol: String,
                       encoder: TextEncoder = MockEncoder()): DataFrame = {
    val fp = TextFunctions.fingerprint(col(textCol))
    val cachedFp = cached.select(col(idCol), col(textCol), col("embedding"))
      .withColumn("__fp", fp)
      // one cache row per content fingerprint: duplicate cached texts would
      // otherwise multiply every matching incoming doc through the join
      .dropDuplicates("__fp")
    val newFp = newDocs.select(col(idCol), col(textCol)).withColumn("__fp", fp)
    val misses = newFp.join(cachedFp.select("__fp"), Seq("__fp"), "left_anti")
    val hits = newFp.join(cachedFp.select(col("__fp"), col("embedding")), Seq("__fp"))
    embed(misses.drop("__fp"), idCol, textCol, encoder)
      .unionByName(hits.drop("__fp"))
  }
}
