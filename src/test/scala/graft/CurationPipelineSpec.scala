package graft

import graft.operators.CurationPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // 60 words, clean, stopword-bearing — passes the quality battery
  private val good =
    (("the quick brown fox jumps over a lazy dog near the river bank and " +
      "waits in that shade for food ") * 3).trim

  test("stage attrition: every stage removes exactly what it should") {
    import spark.implicits._
    val train = Seq(
      (0L, good, "src3"),               // survives everything (weight 1.0)
      (1L, good + " tail", "src3"),     // survives everything
      (2L, good, "src3"),               // exact dup of 0 -> dropped at dedup
      (3L, "too short", "src3"),        // quality reject
      (4L, good.replace("fox", "wolf") + " benchmark leak phrase here five times over again today",
        "src3")                         // contaminated (shares 3-grams w/ bench)
    ).toDF("doc_id", "text", "source")
    val bench = Seq((100L, "benchmark leak phrase here five times over"))
      .toDF("doc_id", "text")
    val report = CurationPipeline.report(train, bench, "doc_id", "text",
        mixWeight = lit(1.0), decontamN = 3, budgetWords = 70, bucketSize = 16)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(report("input") === 5)
    assert(report("quality") === 4)        // doc 3 out
    assert(report("exact_dedup") === 3)    // doc 2 out (dup of 0)
    assert(report("decontaminated") === 2) // doc 4 out (gram overlap)
    assert(report("mixed") === 2)          // weight 1.0 keeps all
    // docs 0 (60w) and 1 (61w) pack into separate 70-word sequences
    assert(report("packed_sequences") === 2)
  }

  test("scrub preamble: blocklist drop, PII redacted, boilerplate lines stripped") {
    import spark.implicits._
    val train = Seq(
      (0L, "keep me\nSHARED FOOTER\nmail a@b.io please", "s0"),
      (1L, "other text\nSHARED FOOTER", "s1"),
      (2L, "totally forbidden thing here", "s2"),   // blocklisted
      (3L, "SHARED FOOTER", "s3")                   // nothing survives
    ).toDF("doc_id", "text", "source")
    val out = CurationPipeline.scrub(train, "doc_id", "text",
        blockPhrases = Seq("forbidden thing"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(0L, 1L))
    assert(out.map(_.getAs[String]("source")).toSeq === Seq("s0", "s1"))
    assert(out(0).getAs[String]("text") === "keep me\nmail <EMAIL> please")
    assert(out(1).getAs[String]("text") === "other text")
  }

  test("curate returns the mixed survivors with their pack assignment") {
    import spark.implicits._
    val train = Seq((0L, good, "src3"), (1L, "too short", "src3"))
      .toDF("doc_id", "text", "source")
    val bench = Seq((100L, "nothing shared at all")).toDF("doc_id", "text")
    val out = CurationPipeline.curate(train, bench, "doc_id", "text", lit(1.0))
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(0L))
    assert(out.head.getAs[Int]("seq_index") === 0)
    assert(out.head.getAs[Int]("n_words") === 60)
  }
}
