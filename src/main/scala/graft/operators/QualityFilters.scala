package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Gopher/C4-style document quality filters for training-data curation —
 * the rule battery an LLM data pipeline runs between ingest and dedup
 * (Rae et al. 2021 "Scaling Language Models" appendix A; Raffel et al.
 * 2020 C4). The reference's own quality scoring (day_10
 * `utils/evaluation.py`) is a composite score; these are the individual
 * REJECTION rules with their published thresholds, each surfaced as a
 * metric column so a pipeline can tune cutoffs without re-scanning.
 *
 * Everything is a pure column expression over `split`/`transform`/
 * `filter`/`aggregate` array combinators: one narrow projection, no
 * UDFs, no shuffle — Catalyst prunes to the two input columns and the
 * whole battery rides a single WholeStageCodegen stage, so the cost at
 * 100 TB is one streaming pass over the text column.
 */
object QualityFilters {

  /** Distinct-stopword presence list (Gopher uses a similar small set). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "that")

  // Gopher-flavored thresholds, surfaced as named constants
  val MinWords = 50
  val MaxWords = 100000
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MinAlphaWordRatio = 0.8
  val MaxSymbolWordRatio = 0.1
  val MaxBulletLineRatio = 0.9
  val MaxEllipsisLineRatio = 0.3
  val MaxDupLineRatio = 0.3
  val MinStopwordHits = 2

  private def nonBlankLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  private def words(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => length(w) > 0)

  /**
   * Per-document quality metrics + the keep verdict. Output columns:
   * `n_words, n_lines, mean_word_len, alpha_word_ratio,
   * symbol_word_ratio, bullet_line_ratio, ellipsis_line_ratio,
   * dup_line_ratio, stopword_hits, keep` — ratios rounded to 6 dp (the
   * oracle-parity convention), `keep` = conjunction of every rule.
   */
  def gopherMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val ws = words(text)
    val lines = nonBlankLines(text)
    val nWords = size(ws)
    val nLines = size(lines)
    // Σ word lengths (integer) → mean as one double division
    val sumLen = aggregate(ws, lit(0), (acc, w) => acc + length(w))
    val alphaWords = size(filter(ws, w => w.rlike("[A-Za-z]")))
    // '#' occurrences + '...' occurrences (C4's symbol markers), counted
    // by length deltas — integer arithmetic, portable to the oracle
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses = (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val bulletLines = size(filter(lines, l => l.startsWith("- ") || l.startsWith("* ")))
    val ellipsisLines = size(filter(lines, l => l.endsWith("...")))
    val dupLines = nLines - size(array_distinct(lines))
    val stopHits = size(array_intersect(
      transform(ws, w => lower(w)), lit(Stopwords.toArray)))

    val ratio = (num: Column, den: Column) =>
      round(num.cast("double") / den.cast("double"), 6)

    docs.select(
        col(idCol),
        nWords.as("n_words"),
        nLines.as("n_lines"),
        ratio(sumLen, nWords).as("mean_word_len"),
        ratio(alphaWords, nWords).as("alpha_word_ratio"),
        ratio(hashes + ellipses, nWords).as("symbol_word_ratio"),
        ratio(bulletLines, nLines).as("bullet_line_ratio"),
        ratio(ellipsisLines, nLines).as("ellipsis_line_ratio"),
        ratio(dupLines, nLines).as("dup_line_ratio"),
        stopHits.as("stopword_hits"))
      .withColumn("keep",
        col("n_words").between(MinWords, MaxWords) &&
        col("mean_word_len").between(MinMeanWordLen, MaxMeanWordLen) &&
        col("alpha_word_ratio") >= MinAlphaWordRatio &&
        col("symbol_word_ratio") <= MaxSymbolWordRatio &&
        col("bullet_line_ratio") <= MaxBulletLineRatio &&
        col("ellipsis_line_ratio") <= MaxEllipsisLineRatio &&
        col("dup_line_ratio") <= MaxDupLineRatio &&
        col("stopword_hits") >= MinStopwordHits)
  }

  /** The transform form: documents that pass every rule. */
  def keepDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val verdicts = gopherMetrics(docs, idCol, textCol)
      .where(col("keep")).select(col(idCol))
    docs.join(verdicts, Seq(idCol), "left_semi")
  }
}
