package graft.operators

import org.apache.spark.sql.SparkSession



/** Scratch profiler for the day_6 index-build phases: reproduces the
  * bench's large dataset (50k x 384 clustered gaussians) and times each
  * build several times so the hot phase is visible. Not part of the
  * driver contract — run by hand via
  * `sbt -batch "runMain graft.operators.ProfileBuild [n] [dim]"`.
  */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 50000
    val dim = if (args.length > 1) args(1).toInt else 384
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nClusters = 100
    val centers = Array.tabulate(nClusters) { c =>
      val r = new java.util.Random(42L + c)
      Array.fill(dim)(r.nextGaussian() * 5.0)
    }
    val bc = spark.sparkContext.broadcast(centers)
    val docs = spark.range(n.toLong).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val ctr = bc.value((id % nClusters).toInt)
          val r = new java.util.Random(1000L + id)
          (id, Array.tabulate(dim)(i => (ctr(i) + r.nextGaussian()).toFloat))
        }
      }
      .rdd.cache()
    docs.count()

    def t[A](label: String)(fn: => A): A = {
      val t0 = System.nanoTime()
      val r = fn
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    (1 to 3).foreach { round =>
      println(s"--- round $round (n=$n dim=$dim) ---")
      val ivf = t("buildIvf") {
        ServingIndex.buildIvf(docs, dim, nlist = math.min(100, n / 10),
          iterations = 10, numSlabs = 16)
      }
      ivf.slabs.unpersist(blocking = true)
      val sampled = t("takeSample only") {
        docs.filter { case (_, v) => v != null && v.length == dim }
          .takeSample(withReplacement = false, math.min(100, n / 10) * 256, 42L)
      }
      println(s"  (sample: ${sampled.length})")
      val cents = t("trainCentroids (sample+lloyd)") {
        ServingIndex.trainCentroids(docs, dim, math.min(100, n / 10), 10, 42L)
      }
      println(s"  (centroids: ${cents.length})")
      val books = t("trainCodebooks only") {
        PqIndex.trainCodebooks(docs, dim, m = dim / 4, iterations = 10)
      }
      println(s"  (codebooks m=${books.m})")
      val pq = t("buildPq") {
        PqIndex.buildPq(docs, dim, m = dim / 4, iterations = 10, numSlabs = 16)
      }
      pq.slabs.unpersist(blocking = true)
      val ivfpq = t("buildIvfPq") {
        PqIndex.buildIvfPq(docs, dim, nlist = math.min(100, n / 10),
          m = dim / 4, iterations = 10, numSlabs = 16)
      }
      ivfpq.slabs.unpersist(blocking = true)
      val hnsw = t("buildHnsw") {
        HnswIndex.build(docs, dim, m = 16, efConstruction = 64,
          KnnSearch.L2, numShards = 16)
      }
      hnsw.shards.unpersist(blocking = true)
    }
    spark.stop()
  }
}
