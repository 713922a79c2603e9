package graft

import graft.functions.VectorFunctions._
import graft.plans.VectorSimplification
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorSimplificationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def install(): Unit = {
    val o = spark.sessionState.experimentalMethods
    if (!o.extraOptimizations.contains(VectorSimplification))
      o.extraOptimizations = o.extraOptimizations :+ VectorSimplification
  }

  // parquet-backed input so ConvertToLocalRelation cannot fold the plan away
  private lazy val e = Tables(spark, TestSpark.sfDir, "embeddings")
    .limit(20).select(col("vec_id"), col("embedding"))

  test("cosine over l2_normalize collapses (both sides)") {
    install()
    val q = e.as("x").crossJoin(e.as("y")).limit(50).select(
      cosineSimilarity(l2Normalize(col("x.embedding")), l2Normalize(col("y.embedding"))).as("c1"),
      cosineSimilarity(col("x.embedding"), col("y.embedding")).as("c3"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("l2_normalize"), optimized.take(600))
    q.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("dot of normalized vectors is NOT rewritten (unsound for ragged lengths)") {
    install()
    val q = e.as("x").crossJoin(e.as("y")).limit(10).select(
      dotProduct(l2Normalize(col("x.embedding")), l2Normalize(col("y.embedding"))).as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("l2_normalize"))
    // and the rewrite WOULD have been wrong on ragged inputs:
    import spark.implicits._
    val ragged = Seq((Array(3.0f, 4.0f, 12.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val viaDot = ragged.select(dotProduct(l2Normalize($"a"), l2Normalize($"b"))).head().getDouble(0)
    val viaCos = ragged.select(cosineSimilarity($"a", $"b")).head().getDouble(0)
    assert(math.abs(viaDot - 3.0 / 13) < 1e-9)  // full-norm scaling
    assert(math.abs(viaCos - 0.6) < 1e-9)       // prefix-norm cosine
  }

  test("rewrite preserves the zero-vector guard semantics") {
    install()
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val v = df.select(cosineSimilarity(l2Normalize($"a"), $"b")).head().getDouble(0)
    assert(v === 0.0)
  }

  test("unrelated l2_normalize uses are untouched") {
    install()
    val q = e.select(l2Norm(l2Normalize(col("embedding"))).as("n"))
    assert(q.queryExecution.optimizedPlan.toString.contains("l2_normalize"),
      q.queryExecution.optimizedPlan.toString.take(600))
    q.collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }
}
