package graft

import graft.operators.QualityFilters
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
}
