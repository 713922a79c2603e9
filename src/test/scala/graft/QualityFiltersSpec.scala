package graft

import graft.operators.QualityFilters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityFiltersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def metricsOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    QualityFilters.gopherMetrics(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private val goodText =
    (("the quick brown fox jumps over a lazy dog near the river bank and " +
      "waits in that shade for food ") * 3).trim // 60 words, all alphabetic

  test("a clean multi-sentence document passes every rule") {
    val m = metricsOf(Seq((1L, goodText)))(1L)
    assert(m.getAs[Int]("n_words") === 60)
    assert(m.getAs[Boolean]("keep"))
    assert(m.getAs[Double]("alpha_word_ratio") === 1.0)
    assert(m.getAs[Int]("stopword_hits") >= 2)
  }

  test("too-short documents fail the word-count floor") {
    val m = metricsOf(Seq((1L, "just five words right here")))(1L)
    assert(m.getAs[Int]("n_words") === 5)
    assert(!m.getAs[Boolean]("keep"))
  }

  test("mean word length bounds catch minced and smashed text") {
    val minced = Array.fill(60)("a b").mkString(" ") // mean length 1
    val smashed = Array.fill(60)("pneumonoultramicroscopic").mkString(" ")
    val ms = metricsOf(Seq((1L, minced), (2L, smashed)))
    assert(ms(1L).getAs[Double]("mean_word_len") < 3.0)
    assert(!ms(1L).getAs[Boolean]("keep"))
    assert(ms(2L).getAs[Double]("mean_word_len") > 10.0)
    assert(!ms(2L).getAs[Boolean]("keep"))
  }

  test("symbol-heavy text fails the symbol-to-word ratio") {
    val hashy = goodText + " " + Array.fill(10)("#tag").mkString(" ")
    val m = metricsOf(Seq((1L, hashy)))(1L)
    assert(m.getAs[Double]("symbol_word_ratio") > 0.1)
    assert(!m.getAs[Boolean]("keep"))
  }

  test("bullet- and ellipsis-dominated docs fail their line ratios") {
    val words20 = goodText.split(" ").take(20)
    val bullets = Array.fill(5)("- " + goodText).mkString("\n")
    val dots = Array.fill(5)(words20.mkString(" ") + "...").mkString("\n")
    val ms = metricsOf(Seq((1L, bullets), (2L, dots)))
    assert(ms(1L).getAs[Double]("bullet_line_ratio") === 1.0)
    assert(!ms(1L).getAs[Boolean]("keep"))
    assert(ms(2L).getAs[Double]("ellipsis_line_ratio") === 1.0)
    assert(!ms(2L).getAs[Boolean]("keep"))
  }

  test("duplicate lines are measured over non-blank lines only") {
    val line = goodText.split(" ").take(20).mkString(" ")
    val duped = Seq(line, "", line, " ", line, goodText).mkString("\n")
    val m = metricsOf(Seq((1L, duped)))(1L)
    assert(m.getAs[Int]("n_lines") === 4) // blanks dropped
    assert(m.getAs[Double]("dup_line_ratio") === 0.5) // 2 dups / 4 lines
    assert(!m.getAs[Boolean]("keep"))
  }

  test("stopword floor rejects keyword soup") {
    val soup = Array.fill(60)("kubernetes docker jenkins").mkString(" ")
    val m = metricsOf(Seq((1L, soup)))(1L)
    assert(m.getAs[Int]("stopword_hits") === 0)
    assert(!m.getAs[Boolean]("keep"))
  }

  test("repetition metrics: hand-computed n-gram counts") {
    import spark.implicits._
    // "a b a b a b" -> bigrams [a b, b a, a b, b a, a b]: total 5,
    // distinct 2, max 3 -> dup 3/5, top 3/5
    // trigrams [a b a, b a b, a b a, b a b]: total 4, distinct 2, max 2
    val rows = Seq(
      (1L, "a b a b a b"),
      (2L, "all words here are completely distinct tokens today")).toDF("doc_id", "text")
    val m = QualityFilters.repetitionMetrics(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Long]("n_bigrams") === 5L)
    assert(m(1L).getAs[Long]("n_dup_bigrams") === 3L)
    assert(m(1L).getAs[Long]("n_top_bigram") === 3L)
    assert(m(1L).getAs[Long]("n_trigrams") === 4L)
    assert(m(1L).getAs[Long]("n_dup_trigrams") === 2L)
    assert(m(1L).getAs[Long]("n_top_trigram") === 2L)
    assert(!m(1L).getAs[Boolean]("keep_repetition"))
    assert(m(2L).getAs[Long]("n_dup_bigrams") === 0L)
    assert(m(2L).getAs[Long]("n_bigrams") === 7L)
    assert(m(2L).getAs[Long]("n_top_bigram") === 1L)
    // distinct-token doc still fails the top-bigram threshold at only 7
    // bigrams (1/7 > 0.06) — thresholds are corpus calibrations, so pass
    // custom ones to assert the verdict both ways
    val loose = QualityFilters.repetitionMetrics(rows, "doc_id", "text",
      maxDupBigramFrac = 0.1, maxTopBigramFrac = 0.2, maxDupTrigramFrac = 0.1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(loose(2L).getAs[Boolean]("keep_repetition"))
    assert(!loose(1L).getAs[Boolean]("keep_repetition"))
  }

  test("keepDocuments is the semi-join transform of the verdicts") {
    import spark.implicits._
    val docs = Seq((1L, goodText), (2L, "way too short"),
      (3L, goodText + " extra tail")).toDF("doc_id", "text")
    val kept = QualityFilters.keepDocuments(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 3L))
  }

  test("PII redaction: counts and replacement order, hand-computed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b-c@test.org and x@y.io call 555-0042 host 10.2.0.1 done"),
      (2L, "no pii here"),
      (3L, "octets 1.2.3.4 then 555-1234 twice 555-9876")
    ).toDF("doc_id", "text")
    val counts = QualityFilters.piiCounts(col("text"))
      .map { case (n, c) => c.cast("long").as(n) }
    val out = docs.select(col("doc_id") +: counts :+
        QualityFilters.redactPii(col("text")).as("red"): _*)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 2L) // two emails
    assert(out(0).getLong(2) === 1L)
    assert(out(0).getLong(3) === 1L)
    assert(out(0).getString(4) ===
      "mail <EMAIL> and <EMAIL> call <PHONE> host <IP> done")
    assert(out(1).getLong(1) === 0L)
    assert(out(1).getString(4) === "no pii here")
    // the IP is eaten by <IP> BEFORE the phone pattern can see "2.3.4"
    assert(out(2).getString(4) === "octets <IP> then <PHONE> twice <PHONE>")
  }

  test("token-frequency metrics: hand-computed df, mean, min, rare ratio") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat"),        // the:2 cat:2 sat:1
      (2L, "THE CAT ran ran")     // lowercased; ran df=1, counted twice
    ).toDF("doc_id", "text")
    val out = QualityFilters.tokenFrequencyMetrics(docs, "doc_id", "text", rareDf = 2)
      .orderBy("doc_id").collect()
    // doc 1: dfs (2,2,1) → n=3 mean=5/3 min=1 rare=1/3
    assert(out(0).getLong(1) === 3L)
    assert(out(0).getDouble(2) === math.rint(5.0 / 3 * 1e6) / 1e6)
    assert(out(0).getLong(3) === 1L)
    assert(out(0).getDouble(4) === math.rint(1.0 / 3 * 1e6) / 1e6)
    // doc 2: dfs (2,2,1,1) → n=4 mean=6/4 min=1 rare=2/4
    assert(out(1).getLong(1) === 4L)
    assert(out(1).getDouble(2) === 1.5)
    assert(out(1).getLong(3) === 1L)
    assert(out(1).getDouble(4) === 0.5)
  }

  test("phrase blocklist: word-boundary hits only, keep is the complement") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a fast merge happened"),
      (2L, "fastmerge is one word"),      // no boundary match
      (3L, "the HASH VALUE is cased"),    // lowercased before matching
      (4L, "nothing listed here")
    ).toDF("doc_id", "text")
    val phrases = Seq("fast merge", "hash value")
    val hit = docs.where(QualityFilters.blocklistHit(col("text"), phrases))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(hit.toSeq === Seq(1L, 3L))
    val kept = QualityFilters.keepBlocklist(docs, "text", phrases)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(2L, 4L))
    intercept[IllegalArgumentException] {
      QualityFilters.blocklistHit(col("text"), Seq("bad(regex"))
    }
  }

  test("typed battery is bit-identical to the column expressions (parity guard)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // real docs + crafted edges: tab-only line (non-blank under Spark's
    // space-only trim), trailing \r, bullets, "....." (one non-overlap
    // match), hashes, duplicated lines, trailing newlines, unicode word
    val crafted = Seq(
      (9001L, "\tword\n- bullet one\n- bullet one\n* two\nend...\n\n\n"),
      (9002L, "dots..... ### mixed\r\nnaive caf\u00e9 \u00fcber tokens the a of"),
      (9003L, "   "), (9004L, ""),
      (9005L, (1 to 60).map(i => s"w$i the").mkString(" ")))
      .toDF("doc_id", "text")
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
      .unionByName(crafted)
    val typed = QualityFilters.gopherMetrics(docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    // the historical column battery, reconstructed via keepPredicate's
    // building blocks: compare per-field through the public column API
    val colKeep = docs
      .select(col("doc_id"), QualityFilters.keepPredicate(col("text")).as("keep"))
      .orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    typed.foreach { r =>
      assert(r.getBoolean(10) === colKeep(r.getLong(0)),
        s"keep diverges for doc ${r.getLong(0)}")
    }
  }
}
