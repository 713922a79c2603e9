package graft

import graft.operators.{IREval, RankMetricsAggregator}
import org.scalatest.funsuite.AnyFunSuite

class RankMetricsAggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def retrieved =
    Seq(("q1", "d1", 1), ("q1", "x", 2), ("q1", "d2", 3),
        ("q2", "y", 1), ("q2", "d9", 2))
      .toDF("query_id", "doc_id", "rank")
  private def truth =
    Seq(("q1", "d1"), ("q1", "d2"), ("q1", "d3"), ("q1", "d4"), ("q2", "d9"))
      .toDF("query_id", "doc_id")

  test("aggregator matches the window formulation (day_13 goldens)") {
    val viaAgg = RankMetricsAggregator.perQuery(retrieved, truth, 3)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val viaWindow = IREval.perQuery(retrieved, truth, 3)
      .collect().map(r => r.getAs[String]("query_id") ->
        (r.getAs[Double]("precision"), r.getAs[Double]("recall"),
         r.getAs[Double]("ap"), r.getAs[Double]("rr"))).toMap
    assert(viaAgg.keySet === viaWindow.keySet)
    viaAgg.foreach { case (q, (p, rec, ap, rr)) =>
      val (wp, wr, wap, wrr) = viaWindow(q)
      assert(math.abs(p - wp) < 1e-12, s"$q precision")
      assert(math.abs(rec - wr) < 1e-12, s"$q recall")
      assert(math.abs(ap - wap) < 1e-12, s"$q ap")
      assert(math.abs(rr - wrr) < 1e-12, s"$q rr")
    }
    // hand-computed: q1 AP = (1/1 + 2/3)/4, q2 RR = 1/2
    assert(math.abs(viaAgg("q1")._3 - (1.0 + 2.0 / 3) / 4) < 1e-12)
    assert(math.abs(viaAgg("q2")._4 - 0.5) < 1e-12)
  }

  test("aggregator is partition-order independent (merge correctness)") {
    val big = (1 to 50).map(r => ("q", s"d$r", r)).toDF("query_id", "doc_id", "rank")
      .repartition(7)
    val t = (1 to 50 by 3).map(r => ("q", s"d$r")).toDF("query_id", "doc_id")
    val a = RankMetricsAggregator.perQuery(big, t, 10).head()
    val b = RankMetricsAggregator.perQuery(big.repartition(2), t, 10).head()
    assert(a === b)
  }
}
