package graft

import graft.operators.TextSearch
import org.scalatest.funsuite.AnyFunSuite

/** BM25 keyword retrieval + reciprocal-rank fusion (hybrid search). */
class TextSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bm25: hand-computed golden on a tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry apple")).toDF("doc_id", "text")
    val res = TextSearch.bm25TopK(docs, "doc_id", "text",
        Seq("apple", "cherry"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // N=3, avgdl=3; df(apple)=2, df(cherry)=2 → idf = ln(1.6) for both
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def w(tf: Int, len: Int) =
      idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len / 3.0))
    val exp = Map(
      1L -> w(2, 3),           // apple tf=2
      2L -> w(1, 2),           // cherry tf=1
      3L -> (w(3, 4) + w(1, 4))) // cherry tf=3 + apple tf=1
    assert(res.map(_._1).toSeq === Seq(3L, 1L, 2L)) // d3 > d1 > d2
    res.foreach { case (id, s) =>
      assert(math.abs(s - exp(id)) < 1e-6, s"doc $id: $s vs ${exp(id)}")
    }
  }

  test("bm25: duplicated query terms score once (bag-of-terms, not per-element)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry apple")).toDF("doc_id", "text")
    val once = TextSearch.bm25TopK(docs, "doc_id", "text",
        Seq("apple", "cherry"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val duped = TextSearch.bm25TopK(docs, "doc_id", "text",
        Seq("apple", "cherry", "apple", "apple"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(duped === once)
  }

  test("bm25: query terms absent from the corpus yield no rows") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    assert(TextSearch.bm25TopK(docs, "doc_id", "text", Seq("zeta"), 5).count() === 0)
  }

  test("rrf fusion: shared docs accumulate, order deterministic") {
    import spark.implicits._
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val fused = TextSearch.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exp = Map(
      10L -> 1.0 / 61, 20L -> (1.0 / 62 + 1.0 / 61),
      30L -> 1.0 / 63, 40L -> 1.0 / 62)
    assert(fused.head._1 === 20L) // in both rankings → highest fused
    fused.foreach { case (id, s) =>
      assert(math.abs(s - exp(id)) < 1e-6)
    }
  }

  test("asRanking assigns 1-based ranks under (score desc, doc_id)") {
    import spark.implicits._
    val scored = Seq((5L, 0.9), (7L, 0.9), (2L, 0.95)).toDF("doc_id", "score")
    val ranks = TextSearch.asRanking(scored).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(ranks === Map(2L -> 1, 5L -> 2, 7L -> 3)) // tie broken by id
  }

  test("bm25 over the real documents table returns plausible hits") {
    val docs = Tables(spark, TestSpark.sfDir, "documents")
    val res = TextSearch.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "join", "window"), k = 5).collect()
    assert(res.length === 5)
    assert(res.map(_.getDouble(1)).toSeq.sliding(2).forall(p => p.head >= p.last))
  }
}
