package graft

import graft.operators.Mixing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"src${i % 4}", s"text $i"))
      .toDF("doc_id", "source", "text")
  }

  private val weightExpr =
    (substring(col("source"), 4, 10).cast("int") + 1) / lit(4.0) // src0..3 -> .25..1.0

  test("sampling is deterministic and respects weight 0 and 1") {
    val docs = corpus(400)
    val a = Mixing.weightedSample(docs, "doc_id", weightExpr)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Mixing.weightedSample(docs, "doc_id", weightExpr)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq, "same rows kept on every run")
    // weight 1.0 keeps everything, weight 0.0 keeps nothing
    assert(Mixing.weightedSample(docs, "doc_id", lit(1.0)).count() === 400)
    assert(Mixing.weightedSample(docs, "doc_id", lit(0.0)).count() === 0)
  }

  test("achieved keep rates converge to the configured weights") {
    val docs = corpus(4000) // 1000 docs per source
    val rep = Mixing.mixingReport(docs, "doc_id", "source", weightExpr)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("weight"), r.getAs[Double]("keep_rate"))).toMap
    rep.foreach { case (src, (w, rate)) =>
      assert(math.abs(rate - w) < 0.06, s"$src: rate $rate vs weight $w")
    }
    assert(rep("src3")._1 === 1.0 && rep("src3")._2 === 1.0)
  }

  test("report counts match a manual recount of the sample") {
    val docs = corpus(400)
    val keptBySource = Mixing.weightedSample(docs, "doc_id", weightExpr)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Mixing.mixingReport(docs, "doc_id", "source", weightExpr).collect().foreach { r =>
      assert(r.getAs[Long]("n_kept") === keptBySource.getOrElse(r.getAs[String]("source"), 0L))
      assert(r.getAs[Long]("n_total") === 100L)
    }
  }
}
