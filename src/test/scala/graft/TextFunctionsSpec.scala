package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evalOn(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    Seq(Tuple1(text)).toDF("t").select(c($"t").as("v")).head()

  test("word and char counts") {
    assert(evalOn("the quick brown fox", c => wordCount(c)).getInt(0) === 4)
    assert(evalOn("abc", c => charCount(c)).getInt(0) === 3)
  }

  test("punct ratio") {
    val v = evalOn("ab.,cd", c => punctRatio(c)).getDouble(0)
    assert(math.abs(v - 2.0 / 6) < 1e-12)
  }

  test("stopword ratio counts repeated hits (F14 hit-count semantics)") {
    val v = evalOn("the cat and the dog", c => stopwordRatio(c)).getDouble(0)
    assert(math.abs(v - 3.0 / 5) < 1e-12)
  }

  test("quality score bounded in [0,1] and favors stopword-bearing prose") {
    val good = evalOn("the engine processes the data in a distributed way " * 10,
      c => qualityScore(c)).getDouble(0)
    val bad = evalOn("!!! ??? ,,, ...", c => qualityScore(c)).getDouble(0)
    assert(good > bad)
    assert(good <= 1.0 + 1e-12 && bad >= 0.0)
  }

  test("lang guess picks marker-heavy language, unknown when no hits") {
    assert(evalOn("the cat sat on a mat of wool", c => langGuess(c)).getString(0) === "en")
    assert(evalOn("der hund und die katze ist da", c => langGuess(c)).getString(0) === "de")
    assert(evalOn("zzz qqq www", c => langGuess(c)).getString(0) === "unknown")
  }

  test("fingerprint is whitespace/case canonical") {
    val a = evalOn("The  Quick\tFox", c => fingerprint(c)).getString(0)
    val b = evalOn("the quick fox", c => fingerprint(c)).getString(0)
    val c0 = evalOn("the quick foxx", c => fingerprint(c)).getString(0)
    assert(a === b)
    assert(a !== c0)
  }

  test("shingles slide correctly and degrade gracefully below n") {
    val s = evalOn("a b c d", c => shingles(c, 3)).getSeq[String](0)
    assert(s === Seq("a b c", "b c d"))
    val tiny = evalOn("a b", c => shingles(c, 3)).getSeq[String](0)
    assert(tiny === Seq("a b"))
  }

  test("minhash signature is deterministic and component-independent") {
    val s1 = evalOn("a b c d e f", c => minhashSignature(c, 4)).getSeq[String](0)
    val s2 = evalOn("a b c d e f", c => minhashSignature(c, 4)).getSeq[String](0)
    assert(s1 === s2)
    assert(s1.length === 4)
    assert(s1.distinct.length > 1) // different hash seeds → different minima
  }

  test("simhash of identical token arrays is equal, empty is zero") {
    val t = Array("spark", "engine", "fast")
    assert(simhash64(t) === simhash64(t.clone()))
    assert(simhash64(Array.empty[String]) === 0L)
  }

  test("char-trigram language ID: hand-checked grams and guesses") {
    // "the cat" → distinct trigrams {the, he , e c,  ca, cat}
    val grams = evalOn("the cat", c => charNgrams(c, 3)).getSeq[String](0)
    assert(grams.toSet === Set("the", "he ", "e c", " ca", "cat"))
    assert(evalOn("ab", c => charNgrams(c, 3)).getSeq[String](0).isEmpty)
    assert(evalOn(null, c => charNgrams(c, 3)).getSeq[String](0).isEmpty)
    // profile overlap picks the obvious language
    assert(evalOn("the thing and the other thing",
      c => langGuessNgram(c)).getString(0) === "en")
    assert(evalOn("der schneider und die schule",
      c => langGuessNgram(c)).getString(0) === "de")
    assert(evalOn("zzz qqq", c => langGuessNgram(c)).getString(0) === "unknown")
  }

  test("BPE-ish tokens PARTITION the input: concat identity on 500 random strings") {
    // the pattern's alternation must consume every character exactly
    // once (letters, digits, punctuation, whitespace runs, unicode
    // letters) — if any char were skipped or double-matched, token
    // counts would silently drift
    val rng = new scala.util.Random(7)
    val alphabet = "abz AB09.,!?'\t\n$#éß"
    val texts = Seq.fill(500)(
      (0 until rng.nextInt(60)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val rows = df.select($"t", concat_ws("", bpeTokens($"t")).as("r")).collect()
    rows.foreach(r => assert(r.getString(1) === r.getString(0)))
    // and charNgrams agrees with a plain sliding-window reference
    val gs = df.select($"t", charNgrams($"t", 3).as("g")).collect()
    gs.foreach { r =>
      val t = r.getString(0).toLowerCase(java.util.Locale.ROOT)
      val want = if (t.length < 3) Seq.empty else t.sliding(3).toSeq.distinct
      assert(r.getSeq[String](1) === want)
    }
  }

  test("BPE-ish pre-tokenizer: hand-traced GPT-2 pattern semantics") {
    // "I'll pay $12.50, ok!" →
    //   I | 'll | ␣pay | ␣$ | 12 | . | 50 | , | ␣ok | !
    val toks = evalOn("I'll pay $12.50, ok!", c => bpeTokens(c))
      .getSeq[String](0)
    assert(toks === Seq("I", "'ll", " pay", " $", "12", ".", "50", ",", " ok", "!"))
    assert(evalOn("I'll pay $12.50, ok!", c => bpeTokenCount(c)).getInt(0) === 10)
    // whitespace counting sees only 4 "words" — the BPE-ish count is the
    // sharper token-budget estimate
    assert(evalOn("I'll pay $12.50, ok!", c => wordCount(c)).getInt(0) === 4)
    // null-safe, and pure whitespace is one whitespace-run token
    assert(evalOn(null, c => bpeTokenCount(c)).getInt(0) === 0)
    assert(evalOn("   ", c => bpeTokenCount(c)).getInt(0) === 1)
  }
}
