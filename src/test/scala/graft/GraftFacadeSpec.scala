package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftFacadeSpec extends AnyFunSuite {

  test("facade installs SQL functions and the knn strategy on the shared session") {
    // getOrCreate returns the shared test session; the facade must still
    // leave it fully armed (idempotent registration path)
    val spark = Graft.session("local[4]", 4)
    val v = spark.sql("SELECT cosine_similarity(array(1.0f,0.0f), array(1.0f,0.0f)) AS c")
      .head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
    assert(spark.experimental.extraStrategies.contains(graft.plans.KnnJoinStrategy))
  }
}
