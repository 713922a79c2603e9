package graft

import graft.operators.Clustering
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Two tight, well-separated blobs → silhouette must pick k=2. */
  private def blobs = {
    val rng = new scala.util.Random(7)
    (0 until 60).map { i =>
      val center = if (i % 2 == 0) Array(5.0f, 5.0f, 5.0f) else Array(-5.0f, -5.0f, -5.0f)
      (i.toLong, center.map(c => c + rng.nextGaussian().toFloat * 0.2f))
    }.toDF("id", "vec")
  }

  test("silhouette sweep picks the true cluster count (day_5 protocol)") {
    val sel = Clustering.selectK(blobs, "id", "vec", ks = 2 to 5)
    assert(sel.bestK === 2)
    assert(sel.silhouettes(2) > 0.9)
    assert(sel.assignments.select("cluster").distinct().count() === 2)
  }

  test("sweep is deterministic under fixed seed") {
    val a = Clustering.selectK(blobs, "id", "vec", ks = 2 to 4)
    val b = Clustering.selectK(blobs, "id", "vec", ks = 2 to 4)
    assert(a.silhouettes === b.silhouettes)
  }

  test("cluster profile on real embeddings: full coverage, unit norms") {
    val e = Tables(spark, TestSpark.sfDir, "embeddings")
    val prof = Clustering.clusterProfile(e, "vec_id", "embedding", k = 5).collect()
    assert(prof.length === 5)
    assert(prof.map(_.getAs[Long]("n")).sum === e.count())
    prof.foreach(r => assert(math.abs(r.getAs[Double]("avg_norm") - 1.0) < 1e-5))
  }
}
