package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * All-pairs similarity (SURVEY §2.3 J2 — the self-similarity matrix of
 * day_2/noramalization.py:121-205 and day_5 pair ranking, re-expressed as
 * pair ROWS, never a materialized n×n matrix).
 *
 * Scale design: the exact form is a self-join (O(n²) pair space) and is
 * only for broadcast-size inputs; the scale path is
 * [[lshCosinePairs]] — deterministic random-hyperplane signatures bucket
 * the join so the pair space is per-bucket, then candidates are verified
 * with exact cosine. Bucket key is the shuffle key: co-partitioned
 * equi-join, no cross product.
 */
object SimilarityJoin {

  /** Exact upper-triangle pair similarities (i<j). Broadcast-size inputs only. */
  def allPairs(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineSimilarity(col("__va"), col("__vb")).as("sim"))
  }

  /** Global top-k most similar pairs (day_5's top-5 pair ranking, W2). */
  def topPairs(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    allPairs(df, idCol, vecCol)
      .orderBy(col("sim").desc, col("id_a"), col("id_b"))
      .limit(k)

  /**
   * Approximate near-neighbor pairs via random-hyperplane LSH: `numBits`
   * sign bits per band (seeded, deterministic), `bands` bands; vectors
   * sharing any band bucket become candidates, verified with exact cosine.
   *
   * Probability two vectors at angle θ share one band ≈
   * (1 − θ/π)^numBits, so bands×bits tune recall/cost. The hyperplanes are
   * generated from a fixed seed so results are reproducible run-to-run.
   */
  def lshCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, numBits: Int = 8, bands: Int = 8,
                     dim: Int = -1, seed: Long = 42L): DataFrame = {
    // infer the vector dimension from the data unless given: max(size) over
    // non-null vectors is deterministic under any row order (a limit(1)
    // sample would NPE on a null first row and vary with ragged dims)
    val d =
      if (dim > 0) dim
      else {
        val row = df.where(col(vecCol).isNotNull)
          .agg(max(size(col(vecCol)))).collect()(0)
        if (row.isNullAt(0)) { // no non-null vectors ⇒ no pairs
          return df.sparkSession.emptyDataFrame
            .withColumn("id_a", lit(0L)).withColumn("id_b", lit(0L))
            .withColumn("sim", lit(0.0)).limit(0)
        }
        row.getInt(0)
      }
    val rng = new scala.util.Random(seed)
    // bands × numBits hyperplanes, each a dense gaussian vector
    val planes: Array[Array[Array[Double]]] =
      Array.fill(bands, numBits)(Array.fill(d)(rng.nextGaussian()))
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(planes)

    import spark.implicits._
    val sigs = df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val ps = bc.value
        it.flatMap { case (id, v) =>
          if (v == null) Iterator.empty
          else ps.iterator.zipWithIndex.map { case (band, bi) =>
            var sig = 0L
            var b = 0
            while (b < band.length) {
              val plane = band(b)
              var s = 0.0
              val n = math.min(plane.length, v.length)
              var i = 0
              while (i < n) { s += plane(i) * v(i); i += 1 }
              if (s > 0) sig |= (1L << b)
              b += 1
            }
            (id, bi, sig)
          }
        }
      }
      .toDF("id", "band", "bucket")

    val cand = sigs.as("a").join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    val vecs = df.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
    cand
      .join(vecs.withColumnRenamed("__id", "id_a").withColumnRenamed("__v", "__va"), Seq("id_a"))
      .join(vecs.withColumnRenamed("__id", "id_b").withColumnRenamed("__v", "__vb"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineSimilarity(col("__va"), col("__vb")).as("sim"))
      .where(col("sim") >= threshold)
  }
}
