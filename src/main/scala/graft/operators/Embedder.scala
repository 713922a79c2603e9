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

  /** Deterministic mock encoder. Component j of text t is drawn from
    * md5(t + "#" + j):
    *   u = first 13 hex digits (52 bits);  x_j = u / 2^53 − 0.5
    * Note the divisor is 2^53, so x_j ∈ [−0.5, 0): components are all
    * negative and cosines between any two texts sit near 0.75 — a quirk,
    * but the q34 oracle hash-locks this exact arithmetic, so it is
    * documented rather than changed (semantic-chunker thresholds must be
    * chosen inside the real cosine range — see q57). Every operation is
    * IEEE-exact (power-of-two divide; 52 bits fit a double exactly) with
    * NO transcendentals or JVM RNG streams, so any engine with md5
    * reproduces the vectors bit-for-bit. Vectors are deliberately not
    * normalized: cosine scoring normalizes, and skipping it keeps the
    * cross-engine arithmetic to hash/divide/subtract only. */
  case class MockEncoder(dim: Int = 64) extends TextEncoder {
    // "#0".."#dim-1" suffix bytes, built once per (deserialized) encoder
    @transient private lazy val suffixes: Array[Array[Byte]] =
      Array.tabulate(dim)(j => ("#" + j).getBytes("UTF-8"))

    def encodeBatch(texts: Seq[String]): Seq[Array[Float]] = {
      // md5(t ∥ "#" ∥ j) for all j, but the document bytes are absorbed
      // ONCE and the digest state cloned per component — a 1 KB doc costs
      // ~16 block compressions + dim clones instead of dim×16
      // compressions + dim full re-encodings. Bit-identical output by
      // md5's definition (clone preserves exact state); the SUN provider
      // MD5 is cloneable.
      val mdBase = java.security.MessageDigest.getInstance("MD5")
      texts.map { t0 =>
        val t = if (t0 == null) "" else t0
        mdBase.reset()
        mdBase.update(t.getBytes("UTF-8"))
        Array.tabulate(dim) { j =>
          val md = mdBase.clone().asInstanceOf[java.security.MessageDigest]
          md.update(suffixes(j))
          val digest = md.digest()
          var u = 0L
          var i = 0
          while (i < 7) { u = (u << 8) | (digest(i) & 0xffL); i += 1 }
          // 7 bytes = 56 bits; keep the top 52 (13 hex digits)
          u >>>= 4
          ((u / 9007199254740992.0) - 0.5).toFloat // u / 2^53 − 0.5 ∈ [−0.5, 0)
        }
      }
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
    Par.widen(df.select(col(idCol).cast("long"), col(textCol)))
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
