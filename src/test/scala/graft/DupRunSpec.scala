package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DupRunSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strip(rows: Seq[(Long, String)], n: Int = 4, minDocs: Int = 2) =
    Dedup.stripDuplicatedRuns(rows.toDF("id", "text"), "id", "text", n, minDocs)
      .select(col("id"), col("text"), col("n_tokens"), col("n_removed"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

  test("shared 4-token run is removed from every copy; unique docs keep all tokens") {
    val got = strip(Seq(
      (1L, "alpha beta one two three four gamma"),
      (2L, "delta one two three four epsilon zeta"),
      (3L, "totally unique words here nothing shared")))
    assert(got(0) === ((1L, "alpha beta gamma", 7L, 4L)))
    assert(got(1) === ((2L, "delta epsilon zeta", 7L, 4L)))
    assert(got(2) === ((3L, "totally unique words here nothing shared", 6L, 0L)))
  }

  test("within-doc repetition alone is not stripped (df counts DISTINCT docs)") {
    val got = strip(Seq(
      (1L, "one two three four one two three four"),
      (2L, "completely different content sits over here")))
    assert(got(0)._4 === 0L)
    assert(got(0)._2 === "one two three four one two three four")
  }

  test("whole-doc duplicates are emptied in BOTH copies (ExactSubstr contract)") {
    val got = strip(Seq(
      (1L, "same exact document body repeated verbatim fully"),
      (2L, "same exact document body repeated verbatim fully"),
      (3L, "an unrelated survivor document stays intact")))
    assert(got(0) === ((1L, "", 7L, 7L)))
    assert(got(1) === ((2L, "", 7L, 7L)))
    assert(got(2)._4 === 0L)
  }

  test("docs shorter than the window yield no grams and are never stripped") {
    val got = strip(Seq((1L, "tiny doc"), (2L, "tiny doc")))
    assert(got.forall(_._4 == 0L))
    assert(got(0)._2 === "tiny doc")
  }

  test("overlapping hot windows union their coverage (no double counting)") {
    // the shared run is 5 tokens → two overlapping 4-windows; coverage
    // is the 5-token union
    val got = strip(Seq(
      (1L, "x one two three four five y"),
      (2L, "z one two three four five w")))
    assert(got(0) === ((1L, "x y", 7L, 5L)))
    assert(got(1) === ((2L, "z w", 7L, 5L)))
  }

  test("minDocs raises the bar: df=2 run survives at minDocs=3") {
    val rows = Seq(
      (1L, "a shared little run here tail1"),
      (2L, "b shared little run here tail2"),
      (3L, "c other words entirely different tail3"))
    assert(strip(rows, n = 4, minDocs = 3).forall(_._4 == 0L))
    assert(strip(rows, n = 4, minDocs = 2).count(_._4 > 0L) === 2)
  }
}
