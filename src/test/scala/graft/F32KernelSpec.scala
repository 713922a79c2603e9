package graft

import graft.operators.KnnSearch
import org.scalatest.funsuite.AnyFunSuite

class F32KernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("float32 serving kernel agrees with the double kernel on real data") {
    val e = Tables(spark, TestSpark.sfDir, "embeddings")
    val rdd = e.select($"vec_id", $"embedding").as[(Long, Array[Float])].rdd.cache()
    rdd.count()
    val queries = (0L until 10L).map(id => id -> Tables.queryVector(spark, TestSpark.sfDir, id))
    val f32 = KnnSearch.topKBatchRddF32(spark, rdd, queries, 10, KnnSearch.L2, excludeSelf = true)
      .select("query_id", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val f64 = KnnSearch.topKBatchRdd(spark, rdd, queries, 10, KnnSearch.L2, excludeSelf = true)
      .select("query_id", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical neighbor sets except measure-zero float ties: require ≥ 99%
    val overlap = f32.intersect(f64).size.toDouble / f64.size
    assert(overlap >= 0.99, s"overlap $overlap")
    rdd.unpersist()
  }
}
