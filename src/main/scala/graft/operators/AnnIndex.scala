package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) approximate-nearest-neighbor index — the Spark-native
 * answer to the reference's FAISS IVFFlat (day_6/day6_complete.py:105-135,
 * nlist=min(100, n/10), nprobe=10) and pgvector's `ivfflat (lists=100)`
 * (day_9/database/vector_ops.py:74-81).
 *
 * Build is a sample-trained Lloyd fit (shared with the serving tiers —
 * FAISS's own regime, where k-means never iterates over the full corpus)
 * followed by one full-corpus assignment pass; the "index" IS a DataFrame
 * clustered by centroid id. At 100 TB the assignments table is written out
 * partitioned by `cluster`, so a search with nprobe=p reads only p/nlist of
 * the data — partition pruning does the index lookup, and the per-cluster
 * scan is the same codegen'd brute-force kernel as the exact path.
 */
object AnnIndex {

  /** Trained IVF index: driver-side centroids + cluster-keyed assignments. */
  case class IvfIndex(
      centroids: Array[(Int, Array[Double])],
      assignments: DataFrame /* (id, vec, cluster) */)

  /** Fit nlist centroids (sample-trained Lloyd, seeded) and assign every
    * vector. Training runs on a deterministic ≤256·nlist-vector sample
    * driver-local ([[ServingIndex.trainCentroids]] — the FAISS regime:
    * k-means never iterates over the full corpus), so the only
    * full-corpus work is the single assignment pass. The previous MLlib
    * KMeans fit paid maxIter=20 full-corpus jobs for the same seeded,
    * deterministic output quality (AnnIndexSpec recall floors unchanged);
    * q33's corpus build dropped ~4× with the shared trainer. */
  def buildIvf(df: DataFrame, idCol: String, vecCol: String,
               nlist: Int, seed: Long = 42L, iterations: Int = 10): IvfIndex = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("vec"))
    val typed = base.as[(Long, Array[Float])]
    // dimension from ONE sampled row (uniform-width vectors by contract)
    // — a limit-1 scan instead of a full-corpus max(size) aggregate
    val dRow = base.where(col("vec").isNotNull).select(size(col("vec"))).head(1)
    require(dRow.nonEmpty, s"buildIvf: input has no non-null '$vecCol' vectors")
    val d = dRow(0).getInt(0)
    val centroidsF =
      ServingIndex.trainCentroids(typed.rdd, d, nlist, iterations, seed)
    val bc = spark.sparkContext.broadcast(centroidsF)
    val assignments = typed
      .map { case (id, v) => (id, v, ServingIndex.nearestCentroid(v, bc.value)) }
      .toDF("id", "vec", "cluster")
      // cluster-keyed layout: on disk this becomes partitionBy("cluster"),
      // making nprobe search a partition-pruned scan.
      .repartition(col("cluster"))
    val centroids = centroidsF.zipWithIndex
      .map { case (v, i) => (i, v.map(_.toDouble)) }
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
