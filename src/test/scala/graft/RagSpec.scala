package graft

import graft.operators.Rag
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RagSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def results = Seq(
    ("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3)
  ).toDF("query_id", "doc_id", "rank")

  private def docs = Seq(
    ("d1", "alpha " * 40),  // 240 chars
    ("d2", "beta " * 40),   // 200 chars
    ("d3", "gamma " * 400)  // 2400 chars — exceeds per-doc cap
  ).toDF("id", "text")

  test("hydrate joins content onto results (broadcast)") {
    val h = Rag.hydrate(results, docs, "id", "text")
    assert(h.count() === 3)
    assert(h.columns.contains("content"))
  }

  test("context build orders by rank, caps per-doc chars and total budget") {
    val h = Rag.hydrate(results, docs, "id", "text")
    val ctx = Rag.buildContext(h, budgetChars = 600, perDocChars = 500).head()
    val text = ctx.getAs[String]("context")
    assert(text.startsWith("Document 1:\n"))
    assert(text.contains("alpha"))
    assert(ctx.getAs[Long]("n_docs") < 3) // budget cut dropped the tail
    assert(!text.contains("gamma") || text.length <= 600 + 16)
  }

  test("prompt render and deterministic mock answer (day_12 mock rules)") {
    val h = Rag.hydrate(results, docs, "id", "text")
    val ctx = Rag.buildContext(h, 2000, 100)
    val prompt = Rag.renderPrompt(ctx, lit("What is machine learning?"))
    val p = prompt.head().getAs[String]("prompt")
    assert(p.contains("Context:"))
    assert(p.contains("Question: What is machine learning?"))
    val ans = Rag.mockAnswer(prompt.withColumn("question", lit("what is machine learning")), "question")
      .head().getAs[String]("answer")
    assert(ans.contains("Machine learning"))
  }

  test("last-N history window and history stats (W5/A10)") {
    val hist = Seq(
      (1L, true, 0.05), (2L, true, 0.04), (3L, false, 0.10), (4L, true, 0.01)
    ).toDF("ts", "ok", "latency")
    val last2 = Rag.lastN(hist, "ts", 2).collect().map(_.getLong(0)).toSeq
    assert(last2 === Seq(4L, 3L))
    val stats = Rag.historyStats(hist, "ok", "latency").head()
    assert(stats.getAs[Long]("total_queries") === 4L)
    assert(math.abs(stats.getAs[Double]("success_rate") - 0.75) < 1e-12)
    assert(math.abs(stats.getAs[Double]("avg_latency") - 0.05) < 1e-12)
  }

  test("mock answer fallback for unmatched questions") {
    val df = Seq(Tuple1("what is the meaning of life")).toDF("question")
    val ans = Rag.mockAnswer(df, "question").head().getAs[String]("answer")
    assert(ans.contains("could not find"))
  }
}
