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

  test("cross-corpus scoring (CCNet shape): reference-trained model, unseen-bigram floor") {
    // reference: "a b a", "b a" (no 'solo' doc) → C2(a,b)=1, C2(b,a)=2,
    // C1(a)=1, C1(b)=2, V=2. Target "a b" seen: P(b|a)=(1+1)/(1+2)=2/3.
    // Target "c d" fully unseen: P(d|c)=(0+1)/(0+2)=1/2 (the smoothing
    // floor — scores, never errors).
    val ref = Seq((1L, "a b a"), (2L, "b a")).toDF("id", "text")
    val tgt = Seq((10L, "a b"), (11L, "c d")).toDF("id", "text")
    val got = QualityFilters.bigramLmScoresAgainst(ref, tgt, "id", "text")
      .orderBy(col("doc_id")).collect()
    assert(got(0).getLong(1) === 1L)
    assert(math.abs(got(0).getDouble(2) - math.log(2.0 / 3.0)) < 1e-12)
    assert(got(1).getLong(1) === 1L)
    assert(math.abs(got(1).getDouble(2) - math.log(0.5)) < 1e-12)
    // same-corpus scoring is the cross form's special case
    val self = QualityFilters.bigramLmScores(fixture, "id", "text")
      .orderBy(col("doc_id")).collect()
    val cross = QualityFilters.bigramLmScoresAgainst(fixture, fixture, "id", "text")
      .orderBy(col("doc_id")).collect()
    assert(self.map(_.toString).toSeq === cross.map(_.toString).toSeq)
  }

  test("trained quality classifier separates planted classes (spark.ml seam)") {
    val rnd = new scala.util.Random(7)
    val goodWords = Array("the", "report", "describes", "methods", "results",
      "clearly", "with", "tables", "and", "figures")
    val badWords = Array("zz91", "qq$$", "##", "xKcd9", "w0w0w0", "@@@@",
      "b64b64", "%%%", "0xdead", "yyyy8")
    def doc(ws: Array[String]) =
      (0 until 20).map(_ => ws(rnd.nextInt(ws.length))).mkString(" ")
    val labeled = ((1 to 60).map(i => (i.toLong, doc(goodWords), 1.0)) ++
      (61 to 120).map(i => (i.toLong, doc(badWords), 0.0)))
      .toDF("id", "text", "label")
    val model = QualityFilters.trainQualityClassifier(labeled, "text", "label")
    val scored = QualityFilters.scoreWithClassifier(model, labeled)
      .select(col("id"), col("label"), col("quality_prob"))
      .as[(Long, Double, Double)].collect()
    val acc = scored.count { case (_, l, p) => (p >= 0.5) == (l >= 0.5) }.toDouble / scored.length
    assert(acc >= 0.95, s"train accuracy $acc")
    // probabilities are calibrated to the right side, not just ranked
    val goodMean = scored.filter(_._2 == 1.0).map(_._3).sum / 60
    val badMean = scored.filter(_._2 == 0.0).map(_._3).sum / 60
    assert(goodMean > 0.8 && badMean < 0.2, s"good=$goodMean bad=$badMean")
  }

  test("hashedLinearScoreMicros: zero-token docs score zero; determinism") {
    val df = Seq((1L, "   "), (2L, "hello world"), (3L, "hello world")).toDF("id", "text")
    val got = QualityFilters.hashedLinearScoreMicros(df, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got(0) === ((1L, 0L, 0L)))
    assert(got(1)._2 === 2L)
    assert(got(1)._3 === got(2)._3) // same text, same score
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
