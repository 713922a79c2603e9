package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The reference's clean_text chain (SURVEY §3.3 step 2;
 * day_10/utils/text_processor.py:31-134): unicode normalize → encoding
 * fixes → whitespace normalize → punctuation/contraction fixes → optional
 * special-char strip. Every step after the unicode head is a codegen'd
 * builtin (`regexp_replace`/`translate` chains); the NFKC head is the one
 * scalar UDF in the chain, with an ASCII fast-path that returns the string
 * untouched without calling the JVM Normalizer (one char scan — on a
 * mostly-ASCII corpus the UDF cost is the scan, not normalization).
 */
object TextClean {

  /** F9: Unicode NFKC normalization — the head of the reference's chain
    * (day_10/utils/text_processor.py:46-49, `unicodedata.normalize`).
    * NFKC folds compatibility forms (ﬁ→fi, fullwidth Ａ→A, ①→1) and
    * composes combining sequences (e + U+0301 → é), matching Python's
    * `unicodedata.normalize('NFKC', …)` — both implement Unicode
    * normalization, so outputs agree. */
  private val nfkcUdf = udf { s: String =>
    if (s == null) null
    else {
      var ascii = true
      var i = 0
      while (ascii && i < s.length) {
        if (s.charAt(i) >= 0x80) ascii = false
        i += 1
      }
      if (ascii) s
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    }
  }

  def normalizeUnicode(c: Column): Column = nfkcUdf(c)

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

  /** Full chain. Deliberate deviation from day_10's order: the reference
    * normalizes BEFORE its encoding fixes, but cp1252 mojibake sequences
    * end in compatibility chars (â€™ is U+00E2 U+20AC U+2122; NFKC folds
    * ™→TM), so normalize-first makes the reference's own â€™ table entry
    * unreachable. We repair mojibake first, then NFKC — same outputs on
    * well-formed text, and mojibake actually gets fixed. */
  def cleanText(c: Column): Column =
    trim(normalizeWhitespace(fixPunctuation(expandContractions(
      normalizeUnicode(fixEncoding(c))))))
}
