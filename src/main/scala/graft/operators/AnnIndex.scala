package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) approximate-nearest-neighbor index — the Spark-native
 * answer to the reference's FAISS IVFFlat (day_6/day6_complete.py:105-135,
 * nlist=min(100, n/10), nprobe=10) and pgvector's `ivfflat (lists=100)`
 * (day_9/database/vector_ops.py:74-81).
 *
 * BASELINE.json's north star: "MLlib for batch vector index build". Build is
 * a batch KMeans fit (MLlib, seeded); the "index" IS a DataFrame clustered
 * by centroid id. At 100 TB the assignments table is written out
 * partitioned by `cluster`, so a search with nprobe=p reads only p/nlist of
 * the data — partition pruning does the index lookup, and the per-cluster
 * scan is the same codegen'd brute-force kernel as the exact path.
 */
object AnnIndex {

  /** Trained IVF index: driver-side centroids + cluster-keyed assignments. */
  case class IvfIndex(
      centroids: Array[(Int, Array[Double])],
      assignments: DataFrame /* (id, vec, cluster) */)

  /** Fit nlist centroids (seeded KMeans) and assign every vector. */
  def buildIvf(df: DataFrame, idCol: String, vecCol: String,
               nlist: Int, seed: Long = 42L): IvfIndex = {
    val feats = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("vec"))
      .withColumn("features", array_to_vector(col("vec")))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").setPredictionCol("cluster")
      .fit(feats)
    val assignments = model.transform(feats)
      .select(col("id"), col("vec"), col("cluster"))
      // cluster-keyed layout: on disk this becomes partitionBy("cluster"),
      // making nprobe search a partition-pruned scan.
      .repartition(col("cluster"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }
    IvfIndex(centroids, assignments)
  }

  /** Persist the index partitioned by cluster (the on-disk inverted file)
    * plus a tiny centroids table alongside. */
  def writeIndex(index: IvfIndex, path: String): Unit = {
    index.assignments.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/assignments")
    val spark = index.assignments.sparkSession
    import spark.implicits._
    index.centroids.toSeq.toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Reopen a persisted index. Search through the reopened index prunes
    * parquet partitions: only the probed cluster directories are read. */
  def openIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    IvfIndex(centroids, spark.read.parquet(s"$path/assignments"))
  }

  /**
   * Batched IVF search: per query pick the `nprobe` nearest centroids
   * (driver-side — centroids are tiny), then join candidates on cluster
   * and rank. Only nprobe/nlist of the corpus is scanned per query.
   */
  def searchIvf(index: IvfIndex, queries: Seq[(Long, Array[Float])],
                k: Int, nprobe: Int, excludeSelf: Boolean = false): DataFrame = {
    val spark = index.assignments.sparkSession
    import spark.implicits._
    val probes = queries.flatMap { case (qid, qv) =>
      val qd = qv.map(_.toDouble)
      index.centroids
        .map { case (c, cv) => (c, l2Dist(qd, cv)) }
        .sortBy(_._2).take(nprobe)
        .map { case (c, _) => (qid, c, qv) }
    }
    val probeDf = probes.toDF("query_id", "cluster", "qvec")
    // static partition pruning: the probed cluster set is known driver-side,
    // so push it as a literal isin — on a partitionBy("cluster") layout the
    // scan reads only those directories (guaranteed PartitionFilters, no
    // reliance on dynamic pruning heuristics).
    val probedClusters = probes.map(_._2).distinct
    val scoredAll = index.assignments
      .where(col("cluster").isin(probedClusters: _*))
      .join(broadcast(probeDf), Seq("cluster"))
      .select(col("query_id"), col("id").as("doc_id"),
        cosineSimilarity(col("qvec"), col("vec")).as("score"))
    // self-exclusion is opt-in (as in KnnSearch): query ids that merely
    // collide numerically with corpus ids must not lose a true neighbor
    val scored =
      if (excludeSelf) scoredAll.where(col("query_id") =!= col("doc_id"))
      else scoredAll
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Recall@k of this IVF configuration against the exact scan (day_6's
    * evaluation protocol — exact search is the oracle). Builds a throwaway
    * index; for repeated evaluation reuse a prebuilt/persisted index via
    * the overload below. */
  def recallVsExact(df: DataFrame, idCol: String, vecCol: String,
                    queries: Seq[(Long, Array[Float])], k: Int,
                    nlist: Int, nprobe: Int): DataFrame =
    recallVsExact(buildIvf(df, idCol, vecCol, nlist), df, idCol, vecCol,
      queries, k, nprobe)

  /** Recall@k through an EXISTING index (no rebuild — the KMeans fit is
    * the expensive part; a bench loop or repeated eval reuses one index). */
  def recallVsExact(index: IvfIndex, df: DataFrame, idCol: String,
                    vecCol: String, queries: Seq[(Long, Array[Float])],
                    k: Int, nprobe: Int): DataFrame = {
    val approx = searchIvf(index, queries, k, nprobe, excludeSelf = true)
      .select("query_id", "doc_id")
    val exact = KnnSearch.topKBatch(df, idCol, vecCol, queries, k,
        KnnSearch.Cosine, excludeSelf = true)
      .select("query_id", "doc_id")
    IREval.recallVsExact(approx, exact)
  }

  private def l2Dist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
}
