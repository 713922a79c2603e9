package graft

import graft.operators.QualityFilters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus: "a b a", "b a", "solo" — hand-computed Laplace bigram model:
  // bigrams: doc1 (a,b)@1 (b,a)@2; doc2 (b,a)@1. C2(a,b)=1, C2(b,a)=2;
  // prefix counts C1(a)=1, C1(b)=2; vocab {a,b,solo} → V=3.
  // P(b|a) = (1+1)/(1+3) = 1/2;  P(a|b) = (2+1)/(2+3) = 3/5.
  private def fixture = Seq(
    (1L, "a b a"), (2L, "b a"), (3L, "solo")).toDF("id", "text")

  test("bigramCounts matches the hand-computed model") {
    val got = QualityFilters.bigramCounts(fixture, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === Set(
      (1L, 1L, 1L, 1L, 3L), // (a,b): pair 1, prefix C1(a)=1
      (1L, 2L, 2L, 2L, 3L), // (b,a): pair 2, prefix C1(b)=2
      (2L, 1L, 2L, 2L, 3L)))
  }

  test("bigramLmScores: hand-computed avg logprob and perplexity; short docs null") {
    val got = QualityFilters.bigramLmScores(fixture, "id", "text")
      .orderBy(col("doc_id")).collect()
    val d1 = got(0); val d2 = got(1); val d3 = got(2)
    assert(d1.getLong(1) === 2L)
    val avg1 = (math.log(0.5) + math.log(0.6)) / 2
    assert(math.abs(d1.getDouble(2) - avg1) < 1e-12)
    assert(math.abs(d1.getDouble(3) - math.exp(-avg1)) < 1e-12)
    assert(d2.getLong(1) === 1L)
    assert(math.abs(d2.getDouble(2) - math.log(0.6)) < 1e-12)
    assert(math.abs(d2.getDouble(3) - 5.0 / 3.0) < 1e-12)
    assert(d3.getLong(1) === 0L)
    assert(d3.isNullAt(2) && d3.isNullAt(3))
  }

  test("perplexity separates formulaic from singleton-token documents") {
    // 20 docs repeating the same phrase + 2 docs of corpus-unique tokens:
    // the formulaic docs' bigrams are corpus-frequent → low perplexity;
    // the singleton docs' bigrams are unseen-but-smoothed → high
    val docs = ((1L to 20L).map(i => (i, "the quick brown fox jumps")) ++
      Seq((100L, "zxqv wkjh plmn qrst uvwy"), (101L, "aabb ccdd eeff gghh iijj")))
      .toDF("id", "text")
    val scored = QualityFilters.bigramLmScores(docs, "id", "text")
      .select(col("doc_id"), col("perplexity")).as[(Long, Double)].collect().toMap
    val formulaic = scored(1L)
    val garbage = math.min(scored(100L), scored(101L))
    assert(formulaic < garbage / 3,
      s"expected clear separation: formulaic=$formulaic garbage=$garbage")
  }

  test("case and whitespace normalization match wordTokens semantics") {
    val a = QualityFilters.bigramCounts(
      Seq((1L, "  Hello   WORLD  "), (2L, "hello world")).toDF("id", "text"),
      "id", "text").collect()
    // both docs produce the SAME bigram (hello, world): pair count 2
    assert(a.length === 2)
    assert(a.forall(r => r.getLong(2) === 2L))
  }
}
