package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * RAG assembly operators (SURVEY §2.8 F24–F26, §3.2): hydrate retrieved ids
 * with document content (J4), build a length-budgeted ordered context
 * string (F25), render the prompt (F24) and a deterministic mock answer
 * (F26 — the reference's own testable keyword-rule answerer,
 * day_12/src/main.py:291-317).
 */
object Rag {

  /** Broadcast hash join of retrieval results to document content (J4). */
  def hydrate(results: DataFrame, docs: DataFrame,
              docIdCol: String, contentCol: String): DataFrame =
    results.join(broadcast(docs.select(col(docIdCol).as("doc_id"),
        col(contentCol).as("content"))), Seq("doc_id"))

  /**
   * Ordered context build under a character budget (F25,
   * day_12/src/main.py:419-438): docs in rank order, each rendered as
   * "Document {rank}:\n{content}", concatenated and cut at `budgetChars`.
   * The running-length cut is a window sum over rank — no driver loop.
   */
  def buildContext(hydrated: DataFrame, budgetChars: Int = 2000,
                   perDocChars: Int = 500): DataFrame = {
    val snippet = substring(col("content"), 1, perDocChars)
    val piece = concat(lit("Document "), col("rank").cast("string"), lit(":\n"), snippet)
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    hydrated
      .withColumn("__piece", piece)
      .withColumn("__running", sum(length(col("__piece")) + lit(2)).over(w))
      .where(col("__running") <= budgetChars)
      .groupBy(col("query_id"))
      .agg(concat_ws("\n\n",
        array_sort(collect_list(struct(col("rank"), col("__piece"))))
          .getField("__piece")).as("context"),
        count(lit(1)).as("n_docs"))
  }

  /** Prompt render (F24, day_11/main.py:30-62). */
  def renderPrompt(ctx: DataFrame, question: Column): DataFrame =
    ctx.select(col("query_id"),
      concat(
        lit("Answer the question based on the context below.\n\nContext:\n"),
        col("context"),
        lit("\n\nQuestion: "), question,
        lit("\n\nAnswer:")).as("prompt"))

  /** Last-N query history window (W5, day_12/api/api_server.py:196-206) —
    * an appended log queried newest-first. */
  def lastN(history: DataFrame, tsCol: String, n: Int): DataFrame =
    history.orderBy(col(tsCol).desc).limit(n)

  /** Query-history stats (A10): totals, success rate, latency mean. */
  def historyStats(history: DataFrame, okCol: String, latencyCol: String): DataFrame =
    history.agg(
      count(lit(1)).as("total_queries"),
      avg(when(col(okCol), 1.0).otherwise(0.0)).as("success_rate"),
      avg(col(latencyCol)).as("avg_latency"))

  /** Deterministic keyword-rule mock answer (F26) — testable stand-in for
    * the LLM call, mirroring the reference's mock. */
  def mockAnswer(prompts: DataFrame, questionCol: String): DataFrame = {
    val q = lower(col(questionCol))
    prompts.withColumn("answer",
      when(q.contains("machine learning"),
        lit("Machine learning is a subset of AI that learns patterns from data."))
      .when(q.contains("vector"),
        lit("A vector database stores embeddings and answers similarity queries."))
      .when(q.contains("spark"),
        lit("Apache Spark is a distributed engine for large-scale data processing."))
      .otherwise(lit("I could not find a relevant answer in the context.")))
  }
}
