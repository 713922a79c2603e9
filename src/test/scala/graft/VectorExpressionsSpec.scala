package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val a = Array(1.0f, 2.0f, 3.0f)
  private val b = Array(4.0f, 5.0f, 6.0f)

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(c.as("v")).head().getDouble(0)

  test("dot product golden") {
    assert(one(dotProduct($"a", $"b")) === 32.0)
  }

  test("cosine similarity golden (scipy cross-check value, day_2 pattern)") {
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(one(cosineSimilarity($"a", $"b")) - expected) < 1e-12)
  }

  test("l2 distance golden") {
    assert(math.abs(one(l2Distance($"a", $"b")) - math.sqrt(27.0)) < 1e-12)
  }

  test("cosine of identical vectors is 1 (similarity-matrix diagonal check)") {
    val d = Seq(Tuple1(a)).toDF("a").select(cosineSimilarity($"a", $"a")).head().getDouble(0)
    assert(math.abs(d - 1.0) < 1e-12)
  }

  test("cosine is symmetric and bounded on real embeddings") {
    val e = Tables(spark, TestSpark.sfDir, "embeddings").limit(50).cache()
    val pairs = e.as("x").crossJoin(e.as("y"))
      .select(cosineSimilarity($"x.embedding", $"y.embedding").as("xy"),
        cosineSimilarity($"y.embedding", $"x.embedding").as("yx"))
    val rows = pairs.collect()
    assert(rows.forall(r => r.getDouble(0) === r.getDouble(1)))
    assert(rows.forall(r => r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9))
  }

  test("l2_normalize produces unit norms (assert np.allclose(norms, 1) parity)") {
    val norms = Tables(spark, TestSpark.sfDir, "embeddings").limit(100)
      .select(l2Norm(l2Normalize($"embedding")).as("n")).collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
  }

  test("zero vector: cosine guards to 0, normalize maps to itself") {
    val z = Array(0.0f, 0.0f, 0.0f)
    val df = Seq((z, a)).toDF("z", "a")
    assert(df.select(cosineSimilarity($"z", $"a")).head().getDouble(0) === 0.0)
    val out = df.select(l2Normalize($"z")).head().getSeq[Double](0)
    assert(out === Seq(0.0, 0.0, 0.0))
  }

  test("null array yields null (nullIntolerant)") {
    val df = Seq((Option.empty[Array[Float]], Some(a))).toDF("x", "y")
    assert(df.select(cosineSimilarity($"x", $"y")).head().isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    // filter(expr) with a non-deterministic guard falls back to interpreted
    // eval paths in some plans; instead compare against a hand computation.
    val got = one(cosineSimilarity($"a", $"b"))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    assert(got === dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  test("SQL registration surface") {
    registerAll(spark)
    val v = spark.sql("SELECT cosine_similarity(array(1.0f,0.0f), array(0.0f,1.0f)) AS c")
      .head().getDouble(0)
    assert(v === 0.0)
  }
}
