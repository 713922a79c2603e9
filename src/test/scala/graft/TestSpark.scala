package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (suites are lazy-init). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // match the production sessions (Graft.configure/Bench): the grid
      // shuffles and slab broadcasts must be exercised under Kryo
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

/** The seeded clustered-gaussian corpus the serving-index suites share
  * (same generator shape as Bench.day6Workload: seed-42 centers,
  * per-id gaussian draws) — one definition so the specs cannot drift
  * apart from each other. */
object ClusteredFixture {
  def corpus(spark: SparkSession, n: Int, dim: Int, nClusters: Int = 20,
             partitions: Int = 8): org.apache.spark.rdd.RDD[(Long, Array[Float])] = {
    val d = dim
    val centers = Array.tabulate(nClusters) { c =>
      val r = new java.util.Random(42L + c)
      Array.fill(d)(r.nextGaussian() * 5.0)
    }
    spark.sparkContext.parallelize(0L until n.toLong, partitions).map { id =>
      val ctr = centers((id % nClusters).toInt)
      val r = new java.util.Random(1000L + id)
      (id, Array.tabulate(d)(i => (ctr(i) + r.nextGaussian()).toFloat))
    }
  }

  def queries(nQueries: Int, dim: Int): Array[(Long, Array[Float])] =
    (0 until nQueries).map { q =>
      val r = new java.util.Random(9000L + q)
      (q.toLong, Array.fill(dim)(r.nextGaussian().toFloat * 5.0f))
    }.toArray
}
