package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Training-sequence packing — the LLM-pipeline step between curation and
 * the tokenizer/loader: concatenate documents into fixed token-budget
 * training sequences so short documents don't waste context-window slots
 * as padding. (The reference stops at chunking; packing is its inverse —
 * day_10's chunkers split long docs DOWN to a budget, this packs short
 * docs UP to one.)
 *
 * Determinism + scale: global greedy packing is a sequential scan — not
 * distributable. The standard production compromise is BUCKETED greedy:
 * documents are grouped into buckets of `bucketSize` consecutive ids and
 * packed greedily in id order within each bucket. Buckets are
 * independent, so packing parallelizes per bucket (`flatMapGroups` after
 * a shuffle on the bucket key — bounded group size by construction, no
 * skew), and the assignment is a pure function of (ids, word counts,
 * budget) — reproducible anywhere, including the DuckDB oracle's
 * recursive CTE (q61).
 *
 * Greedy rule: a document joins the current sequence iff its word count
 * fits the remaining budget, else it starts a new sequence. A document
 * longer than the whole budget gets a sequence of its own, flagged
 * `oversize` (the caller chunks those first — G1–G8 — or truncates).
 */
object Packing {

  final case class PackedDoc(doc_id: Long, bucket: Long, seq_index: Int,
                             n_words: Int, acc_words: Int, oversize: Boolean)

  /**
   * Per-document sequence assignment: `(doc_id, bucket, seq_index,
   * n_words, acc_words, oversize)` where `seq_index` counts sequences
   * within the bucket (0-based) and `acc_words` is the sequence's
   * running total AFTER this document — the greedy state, so the oracle
   * can check the packing decision itself, not just the partition.
   */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
                 budgetWords: Int, bucketSize: Int = 16): Dataset[PackedDoc] = {
    require(budgetWords > 0 && bucketSize > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val counted = docs.select(
        col(idCol).cast("long").as("doc_id"),
        size(graft.functions.TextFunctions.wordTokens(col(textCol)))
          .as("n_words"))
      // integer `div`, not floor(a/b): the double quotient loses exactness
      // above 2^53, so hash/snowflake-scale ids near bucket boundaries
      // would land in the wrong bucket (the oracle uses integer `//`)
      .withColumn("bucket", expr(s"doc_id div $bucketSize"))
      .as[(Long, Int, Long)]
    counted.groupByKey(_._3).flatMapGroups { (bucket, it) =>
      // bucket groups are ≤ bucketSize rows — the sort is tiny
      val docsSorted = it.toArray.sortBy(_._1)
      var seq = 0
      var acc = 0
      var started = false
      docsSorted.iterator.map { case (id, nw, _) =>
        // explicit first-doc flag, NOT acc == 0: a zero-word document
        // must leave the greedy state exactly like the oracle's
        // recursive CTE does (acc stays 0, next doc still compares
        // acc + nw against the budget), not re-trigger the first branch
        if (!started) { started = true; acc = nw }
        else if (acc + nw <= budgetWords) acc += nw
        else { seq += 1; acc = nw }
        PackedDoc(id, bucket, seq, nw, acc, nw > budgetWords)
      }
    }
  }

  /** The sequence-level view: one row per packed training sequence with
    * its member count, total words, and fill ratio vs the budget. */
  def packedSequences(packed: Dataset[PackedDoc], budgetWords: Int): DataFrame = {
    packed.toDF()
      .groupBy(col("bucket"), col("seq_index"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        max(col("oversize")).as("has_oversize"))
      .withColumn("fill_ratio",
        round(col("total_words").cast("double") / budgetWords, 6))
  }
}
