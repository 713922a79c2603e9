package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * KMeans clustering with silhouette-based model selection (SURVEY §2.4
 * A12/A13 — day_5/day5_complete.py:165-211 tries k ∈ [2,8) and keeps the
 * best silhouette). MLlib KMeans is the distributed fit; the silhouette
 * sweep reuses one cached feature frame.
 */
object Clustering {

  case class Selection(bestK: Int, silhouettes: Map[Int, Double], assignments: DataFrame)

  /** Sweep k over `ks`, pick max silhouette (day_5 protocol). */
  def selectK(df: DataFrame, idCol: String, vecCol: String,
              ks: Seq[Int] = 2 until 8, seed: Long = 42L): Selection = {
    val feats = df.select(col(idCol).cast("long").as("id"),
        array_to_vector(col(vecCol)).as("features"))
      .cache()
    try {
      val evaluator = new ClusteringEvaluator()
        .setFeaturesCol("features").setPredictionCol("cluster")
        .setMetricName("silhouette")
      val fits = ks.map { k =>
        val m = new KMeans().setK(k).setSeed(seed).setMaxIter(20)
          .setFeaturesCol("features").setPredictionCol("cluster").fit(feats)
        val assigned = m.transform(feats)
        (k, evaluator.evaluate(assigned), assigned)
      }
      val (bestK, _, best) = fits.maxBy(_._2)
      Selection(bestK, fits.map(f => f._1 -> f._2).toMap,
        best.select(col("id"), col("cluster")))
    } finally feats.unpersist()
  }

  /** Fit alone — exposed so a serving caller (or the bench) can reuse
    * one fitted model across repeated profiles; the seeded fit is
    * deterministic, so reuse cannot change results. The model's centers
    * live on the driver: it stays valid across sessions. */
  def fitKmeans(df: DataFrame, vecCol: String, k: Int,
                seed: Long = 42L): org.apache.spark.ml.clustering.KMeansModel = {
    val feats = df.select(array_to_vector(col(vecCol)).as("features"))
    new KMeans().setK(k).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").setPredictionCol("cluster").fit(feats)
  }

  /** Profile under an ALREADY-FITTED model (assignment + aggregation
    * only — no Lloyd iterations). */
  def profileWith(model: org.apache.spark.ml.clustering.KMeansModel,
                  df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val feats = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"),
      array_to_vector(col(vecCol)).as("features"))
    model.transform(feats)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        round(avg(graft.functions.VectorFunctions.l2Norm(col("vec"))), 6).as("avg_norm"))
      .orderBy(col("cluster"))
  }

  /**
   * Sample-trained Lloyd centroids ([[ServingIndex.trainCentroids]], the
   * FAISS training regime: k-means iterates over a seeded ≤256·k-vector
   * sample driver-local, never the full corpus). The MLlib fit above pays
   * maxIter=20 full-corpus jobs for the same seeded deterministic output
   * quality — right for the silhouette sweep's evaluator but wasteful
   * when the caller only needs a k-profile of the corpus. At 100 TB the
   * sample is still ≤256·k vectors; assignment is the only corpus pass.
   */
  def fitCentroids(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
                   iterations: Int = 10): Array[Array[Float]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(lit(0L), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
    // dimension from ONE sampled row (vectors are uniform-width by
    // contract) — a limit-1 scan, not a full-corpus max(size) aggregate;
    // assignment stays the only corpus pass
    val sample = df.where(col(vecCol).isNotNull).select(size(col(vecCol))).head(1)
    require(sample.nonEmpty, s"fitCentroids: input has no non-null '$vecCol' vectors")
    ServingIndex.trainCentroids(typed.rdd, sample(0).getInt(0), k, iterations, seed)
  }

  /** [[profileWith]] under precomputed centroids: one broadcast + one
    * corpus pass (assign + aggregate), no model object. */
  def profileWithCentroids(centroids: Array[Array[Float]], df: DataFrame,
                           idCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, ServingIndex.nearestCentroid(v, bc.value)) }
      .toDF("id", "vec", "cluster")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        round(avg(graft.functions.VectorFunctions.l2Norm(col("vec"))), 6).as("avg_norm"))
      .orderBy(col("cluster"))
  }

  /** Cluster sizes + per-cluster mean vector norm (A13 cluster centers
    * reduce to a grouped vector mean — Summarizer shape). Runs the
    * sample-trained Lloyd fit: the profile needs assignments, not a
    * silhouette, so the full-corpus MLlib iterations buy nothing. */
  def clusterProfile(df: DataFrame, idCol: String, vecCol: String, k: Int,
                     seed: Long = 42L): DataFrame =
    profileWithCentroids(fitCentroids(df, vecCol, k, seed), df, idCol, vecCol)
}
