package graft

import graft.operators.IREval
import org.scalatest.funsuite.AnyFunSuite

/** Goldens hand-computed exactly like the reference's own test file
  * (day_13/test/test_evaluation.py:121-218). */
class IREvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one query; relevant = {d1, d2, d3, d4}; retrieved = [d1, x, d2]
  private def retrieved =
    Seq(("q1", "d1", 1), ("q1", "x", 2), ("q1", "d2", 3))
      .toDF("query_id", "doc_id", "rank")
  private def truth =
    Seq(("q1", "d1"), ("q1", "d2"), ("q1", "d3"), ("q1", "d4"))
      .toDF("query_id", "doc_id")

  private def metrics(k: Int): Map[String, Double] = {
    val r = IREval.perQuery(retrieved, truth, k).head()
    Seq("precision", "recall", "f1", "ap", "rr", "ndcg", "hit_rate")
      .map(c => c -> r.getAs[Double](c)).toMap
  }

  test("precision@3 = 2/3, recall@3 = 2/4 (day_13 golden)") {
    val m = metrics(3)
    assert(math.abs(m("precision") - 2.0 / 3) < 1e-12)
    assert(math.abs(m("recall") - 0.5) < 1e-12)
  }

  test("f1 is the harmonic mean") {
    val m = metrics(3)
    val expected = 2 * (2.0 / 3) * 0.5 / ((2.0 / 3) + 0.5)
    assert(math.abs(m("f1") - expected) < 1e-12)
  }

  test("AP = (1/1 + 2/3) / |relevant| (reference divides by total relevant)") {
    val m = metrics(3)
    assert(math.abs(m("ap") - (1.0 + 2.0 / 3) / 4) < 1e-12)
  }

  test("RR = 1 when first retrieved is relevant; 1/3 when third") {
    assert(metrics(3)("rr") === 1.0)
    val late = Seq(("q1", "x", 1), ("q1", "y", 2), ("q1", "d1", 3))
      .toDF("query_id", "doc_id", "rank")
    val rr = IREval.perQuery(late, truth, 3).head().getAs[Double]("rr")
    assert(math.abs(rr - 1.0 / 3) < 1e-12)
  }

  test("NDCG binary formula with min(|rel|,k) ideal slots") {
    val m = metrics(3)
    val dcg = 1.0 / log2(2) + 1.0 / log2(4) // relevant at ranks 1 and 3
    val idcg = 1.0 / log2(2) + 1.0 / log2(3) + 1.0 / log2(4) // min(4,3)=3 slots
    assert(math.abs(m("ndcg") - dcg / idcg) < 1e-12)
  }

  test("hit rate and bounds") {
    val m = metrics(3)
    assert(m("hit_rate") === 1.0)
    assert(m.values.forall(v => v >= 0.0 && v <= 1.0 + 1e-12))
  }

  test("no relevant retrieved: everything zero except defined fields") {
    val none = Seq(("q1", "x", 1), ("q1", "y", 2)).toDF("query_id", "doc_id", "rank")
    val r = IREval.perQuery(none, truth, 3).head()
    assert(r.getAs[Double]("precision") === 0.0)
    assert(r.getAs[Double]("ap") === 0.0)
    assert(r.getAs[Double]("rr") === 0.0)
    assert(r.getAs[Double]("ndcg") === 0.0)
    assert(r.getAs[Double]("hit_rate") === 0.0)
  }

  test("query with empty relevant set still evaluates with zero metrics") {
    // q2 has retrieved rows but NO truth rows (the reference evaluates such
    // queries with zero metrics; they must not vanish from the output)
    val ret = Seq(("q1", "d1", 1), ("q2", "x", 1), ("q2", "y", 2))
      .toDF("query_id", "doc_id", "rank")
    val per = IREval.perQuery(ret, truth, 3)
    assert(per.count() === 2)
    val q2 = per.where($"query_id" === "q2").head()
    Seq("precision", "recall", "f1", "ap", "rr", "ndcg", "hit_rate").foreach { c =>
      assert(q2.getAs[Double](c) === 0.0, c)
    }
    val s = IREval.summary(ret, truth, 3).head()
    assert(s.getAs[Long]("n_queries") === 2L)
  }

  test("k > |retrieved| uses |top_k| = |retrieved| as precision denominator") {
    val m = metrics(10)
    assert(math.abs(m("precision") - 2.0 / 3) < 1e-12) // 3 retrieved only
  }

  test("sweep produces one row per k, macro-averaged") {
    val rows = IREval.sweep(retrieved, truth, Seq(1, 3)).collect()
    assert(rows.map(_.getAs[Int]("k")).toSeq === Seq(1, 3))
    assert(rows.forall(_.getAs[Long]("n_queries") === 1L))
  }

  test("recall vs exact oracle (day_6 recall@k shape)") {
    val exact = Seq(("q1", "a"), ("q1", "b"), ("q1", "c"), ("q1", "d")).toDF("query_id", "doc_id")
    val approx = Seq(("q1", "a"), ("q1", "c"), ("q1", "z")).toDF("query_id", "doc_id")
    val r = IREval.recallVsExact(approx, exact).head().getAs[Double]("recall")
    assert(math.abs(r - 0.5) < 1e-12)
  }

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)
}
