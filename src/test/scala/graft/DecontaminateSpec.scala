package graft

import graft.operators.Decontaminate
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("n-gram overlap flags leaked docs; clean docs survive") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      // full benchmark sentence embedded -> contaminated
      (1L, "prefix words then the quick brown fox jumps over the lazy dog and more"),
      // shares only a 3-gram window, not 5 -> clean at n=5
      (2L, "the quick brown cat sleeps all day in the warm sun here"),
      // no overlap at all
      (3L, "completely unrelated text about spark query engines and columnar io")
    ).toDF("doc_id", "text")
    val hits = Decontaminate.contaminated(train, bench, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet === Set(1L))
    // "the quick brown fox jumps over the lazy dog" has 5 distinct 5-grams,
    // all present in doc 1
    assert(hits(1L) === 5L)
    val clean = Decontaminate.decontaminate(train, bench, "doc_id", "text", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(clean.toSeq === Seq(2L, 3L))
  }

  test("repeated grams inside one doc count once") {
    import spark.implicits._
    val bench = Seq((100L, "a b c")).toDF("doc_id", "text")
    val train = Seq((1L, "a b c x a b c y a b c")).toDF("doc_id", "text")
    val hits = Decontaminate.contaminated(train, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(1L) === 1L) // 'a b c' counted once despite 3 occurrences
  }

  test("docs shorter than n produce no grams and never match") {
    import spark.implicits._
    val bench = Seq((100L, "a b")).toDF("doc_id", "text")
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(Decontaminate.contaminated(train, bench, "doc_id", "text", n = 8).count() === 0)
  }

  test("oversized benchmark falls back to a shuffle join with identical output") {
    import spark.implicits._
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "spark engines shuffle columnar batches across executors nightly")
    ).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words then the quick brown fox jumps over the lazy dog and more"),
      (2L, "the quick brown cat sleeps all day in the warm sun here"),
      (3L, "completely unrelated text about spark query engines and columnar io")
    ).toDF("doc_id", "text")
    // cap of 0 forces the fallback on any non-empty benchmark
    val fallback = Decontaminate.decontaminate(train, bench, "doc_id", "text",
      n = 5, maxBroadcastGrams = 0L)
    val viaBroadcast = Decontaminate.decontaminate(train, bench, "doc_id", "text",
      n = 5)
    assert(fallback.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      viaBroadcast.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // the gram join must NOT be a broadcast-hash join on the fallback
    // route (that is the whole point of the cap) — the contaminated
    // subquery's physical plan carries the join strategy
    val plan = Decontaminate.contaminated(train, bench, "doc_id", "text",
      n = 5, maxBroadcastGrams = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), s"expected shuffle join, got:\n$plan")
  }
}
