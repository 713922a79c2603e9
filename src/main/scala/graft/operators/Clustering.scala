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

  /** Cluster sizes + per-cluster mean vector norm (A13 cluster centers
    * reduce to a grouped vector mean — Summarizer shape). */
  def clusterProfile(df: DataFrame, idCol: String, vecCol: String, k: Int,
                     seed: Long = 42L): DataFrame =
    profileWith(fitKmeans(df, vecCol, k, seed), df, idCol, vecCol)
}
