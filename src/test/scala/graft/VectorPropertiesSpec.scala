package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator properties for the vector math (SURVEY §5: norm==1
  * after normalize, cosine symmetry/bounds, metric identities), evaluated
  * through the actual Catalyst expressions. Deterministic seeds; each
  * property is checked over a generated batch evaluated in one Spark job. */
class VectorPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dimGen = Gen.choose(2, 16)
  private def vecGen(dim: Int): Gen[Array[Float]] =
    Gen.listOfN(dim, Gen.choose(-100.0f, 100.0f)).map(_.toArray)

  /** n deterministic (a,b) same-length pairs. */
  private def pairs(n: Int, seed: Long): Seq[(Array[Float], Array[Float])] = {
    val g = for { d <- dimGen; a <- vecGen(d); b <- vecGen(d) } yield (a, b)
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))
  }

  test("cosine is bounded and symmetric (40 random pairs)") {
    val rows = pairs(40, 1L).toDF("a", "b")
      .select(cosineSimilarity($"a", $"b").as("ab"),
        cosineSimilarity($"b", $"a").as("ba")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
      assert(r.getDouble(0) === r.getDouble(1))
    }
  }

  test("cosine is invariant under positive scaling") {
    val ks = (0 until 40).map(i =>
      Gen.choose(0.1f, 10.0f).pureApply(Gen.Parameters.default, Seed(100L + i)))
    val data = pairs(40, 2L).zip(ks).map { case ((a, _), k) => (a, a.map(_ * k)) }
    val rows = data.toDF("a", "b")
      .select(cosineSimilarity($"a", $"a").as("c1"),
        cosineSimilarity($"a", $"b").as("c2")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6))
  }

  test("l2 distance: identity, symmetry, triangle inequality") {
    val trip = {
      val g = for { d <- dimGen; a <- vecGen(d); b <- vecGen(d); c <- vecGen(d) } yield (a, b, c)
      (0 until 40).map(i => g.pureApply(Gen.Parameters.default, Seed(200L + i)))
    }
    val rows = trip.toDF("a", "b", "c").select(
      l2Distance($"a", $"a").as("aa"),
      l2Distance($"a", $"b").as("ab"),
      l2Distance($"b", $"a").as("ba"),
      l2Distance($"b", $"c").as("bc"),
      l2Distance($"a", $"c").as("ac")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === 0.0)
      assert(r.getDouble(1) === r.getDouble(2))
      assert(r.getAs[Double]("ac") <= r.getAs[Double]("ab") + r.getAs[Double]("bc") + 1e-6)
    }
  }

  test("normalize yields unit norm; dot∘normalize ≡ cosine; d²=2−2cos") {
    val rows = pairs(40, 3L)
      .filter { case (a, b) => a.exists(_ != 0f) && b.exists(_ != 0f) }
      .toDF("a", "b").select(
        l2Norm(l2Normalize($"a")).as("n"),
        dotProduct(l2Normalize($"a"), l2Normalize($"b")).as("dn"),
        cosineSimilarity($"a", $"b").as("c"),
        l2Distance(l2Normalize($"a"), l2Normalize($"b")).as("d")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("n") - 1.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("dn") - r.getAs[Double]("c")) < 1e-9)
      val d = r.getAs[Double]("d"); val c = r.getAs[Double]("c")
      assert(math.abs(d * d - (2 - 2 * c)) < 1e-6)
    }
  }
}
