package graft

import graft.operators.KnnSearch
import graft.plans.KnnJoinPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KnnJoinPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val e = Tables(spark, TestSpark.sfDir, "embeddings").cache()

  test("custom operator plans through KnnJoinExec") {
    val queries = e.where(col("vec_id") < 3)
    val out = KnnJoinPlan.knnJoin(queries, "vec_id", "embedding",
      e, "vec_id", "embedding", k = 5, KnnSearch.Cosine, excludeSelf = true)
    val physical = out.queryExecution.executedPlan
    // physical plan is our exec node (TreeNode renders it without the
    // Exec suffix, so assert on the class)
    assert(physical.exists(_.isInstanceOf[graft.plans.KnnJoinExec]),
      physical.toString.take(500))
  }

  test("results agree with the DataFrame-composed batch path") {
    val queries = e.where(col("vec_id") < 5)
    val planned = KnnJoinPlan.knnJoin(queries, "vec_id", "embedding",
        e, "vec_id", "embedding", k = 10, KnnSearch.Cosine, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val qs = (0L until 5L).map(id => id -> Tables.queryVector(spark, TestSpark.sfDir, id))
    val composed = KnnSearch.topKBatch(e, "vec_id", "embedding", qs, 10,
        KnnSearch.Cosine, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(planned === composed)
  }

  test("document-side predicates still push down beneath the custom node") {
    // fresh (uncached) reads so parquet pushdown is observable
    val fresh = Tables(spark, TestSpark.sfDir, "embeddings")
    val queries = fresh.where(col("vec_id") < 2)
    val out = KnnJoinPlan.knnJoin(queries, "vec_id", "embedding",
      fresh.where(col("label") === 3), "vec_id", "embedding", k = 5)
    val physical = out.queryExecution.executedPlan.toString
    // the predicate lands below the custom node — either as a parquet
    // PushedFilter or as an InMemoryTableScan filter when the table is
    // cache-matched (the cache manager matches by plan, not by variable)
    assert(physical.contains("EqualTo(label,3)") || physical.matches("(?s).*label#\\d+ = 3.*"),
      physical.take(1200))
    // and the filter actually applied
    val labels = out.join(e.select(col("vec_id").as("doc_id"), col("label")), Seq("doc_id"))
      .select("label").distinct().collect().map(_.getInt(0)).toSeq
    assert(labels === Seq(3))
  }

  test("L2 metric through the operator matches cosine ranking on unit vectors") {
    val queries = e.where(col("vec_id") === 9)
    val l2 = KnnJoinPlan.knnJoin(queries, "vec_id", "embedding",
        e, "vec_id", "embedding", k = 10, KnnSearch.L2, excludeSelf = true)
      .collect().map(_.getLong(1)).toSeq
    val cos = KnnJoinPlan.knnJoin(queries, "vec_id", "embedding",
        e, "vec_id", "embedding", k = 10, KnnSearch.Cosine, excludeSelf = true)
      .collect().map(_.getLong(1)).toSeq
    assert(l2 === cos)
  }
}
