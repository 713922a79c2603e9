package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A produced chunk (SURVEY §1.1 abstraction 3; metadata shape from
  * day_10/chunkers/token_chunker.py:9-18).
  *
  * `start_char`/`end_char` are strategy-scoped positions, mirroring the
  * reference's per-strategy metadata: character offsets for char chunkers,
  * token indices for token chunkers, sentence indices for sentence/semantic
  * chunkers, paragraph slots for the paragraph chunker (hybrid chunks carry
  * 0 — sections are not contiguous spans after merging). */
case class Chunk(
    doc_id: Long,
    chunk_index: Int,
    start_char: Int,
    end_char: Int,
    text: String,
    n_tokens: Int,
    chunk_type: String)

/**
 * Document chunkers (SURVEY §2.9 G1–G9). All are one-row→many generators:
 * the stateful scans (overlap carry-back, boundary snapping, grouping) are
 * genuinely imperative per-document logic, so they are typed-`Dataset`
 * flatMaps — each document's chunks are produced on one executor, no
 * cross-row state, embarrassingly parallel at any scale. The fixed-stride
 * char chunker is also expressible declaratively (posexplode over a
 * sequence) and that form is used for the SQL/oracle surface.
 */
object Chunkers {

  /** (doc_id, text) input projection helper. */
  private def docs(df: DataFrame, idCol: String, textCol: String): Dataset[(Long, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
  }

  /**
   * Declarative fixed-stride char chunker: windows of `size` chars every
   * `size - overlap`. Pure builtin expressions (sequence → transform →
   * posexplode) — stays in whole-stage codegen and is SQL-mirrorable.
   */
  def fixedCharChunks(df: DataFrame, idCol: String, textCol: String,
                      size: Int, overlap: Int): DataFrame = {
    require(overlap < size, "overlap must be < size")
    val stride = size - overlap
    val n = length(col("__text"))
    val starts = sequence(lit(0), greatest(ceil((n - overlap).cast("double") / stride).cast("int") - 1, lit(0)))
    df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .select(col("doc_id"), col("__text"), posexplode(transform(starts, i => i * stride)))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_index"),
        col("col").cast("int").as("start_char"),
        substring(col("__text"), col("col") + 1, lit(size)).as("text"))
      .where(length(col("text")) > 0)
  }

  /**
   * The capstone char chunker (day_15/main.py:81-102): 'size'-char windows
   * with `overlap` carry-back, snapping the cut to the last '.' past the
   * window midpoint.
   */
  def charChunks(df: DataFrame, idCol: String, textCol: String,
                 size: Int = 1000, overlap: Int = 200): Dataset[Chunk] = {
    // the sentence snap can pull `end` back to size/2; overlap must stay
    // below that or `start` stops advancing (or goes negative)
    require(overlap >= 0 && overlap < size / 2, "overlap must be in [0, size/2)")
    val spark = df.sparkSession
    import spark.implicits._
    docs(df, idCol, textCol).flatMap { case (id, text) =>
      if (text == null || text.isEmpty) Iterator.empty
      else {
        val out = collection.mutable.ArrayBuffer.empty[Chunk]
        var start = 0
        var idx = 0
        while (start < text.length) {
          var end = math.min(start + size, text.length)
          if (end < text.length) {
            val dot = text.lastIndexOf('.', end)
            if (dot > start + size / 2) end = dot + 1
          }
          val t = text.substring(start, end)
          out += Chunk(id, idx, start, end, t, t.split("\\s+").count(_.nonEmpty), "char")
          idx += 1
          start = if (end >= text.length) text.length else end - overlap
        }
        out.iterator
      }
    }
  }

  /**
   * Token chunker (G1, day_10/chunkers/token_chunker.py:60-141) with
   * whitespace tokens (BPE counts are approximate by design — SURVEY §7.5):
   * ≤ maxTokens per chunk, overlapTokens carried back.
   */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  maxTokens: Int = 100, overlapTokens: Int = 20): Dataset[Chunk] = {
    require(overlapTokens >= 0 && overlapTokens < maxTokens,
      "overlapTokens must be < maxTokens (start would stop advancing)")
    val spark = df.sparkSession
    import spark.implicits._
    docs(df, idCol, textCol).flatMap { case (id, text) =>
      if (text == null || text.isEmpty) Iterator.empty
      else {
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val out = collection.mutable.ArrayBuffer.empty[Chunk]
        var start = 0
        var idx = 0
        while (start < toks.length) {
          val end = math.min(start + maxTokens, toks.length)
          val t = toks.slice(start, end).mkString(" ")
          out += Chunk(id, idx, start, end, t, end - start, "token")
          idx += 1
          start = if (end >= toks.length) toks.length else end - overlapTokens
        }
        out.iterator
      }
    }
  }

  /** Text-complexity score in [0,1] (F16,
    * day_10/chunkers/token_chunker.py:237-267): average sentence length,
    * vocabulary diversity, punctuation density — equal-weighted. */
  def complexityScore(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return 0.0
    val sentences = text.split(SentenceSplit).count(_.trim.nonEmpty).max(1)
    val avgSentLen = math.min(words.length.toDouble / sentences / 30.0, 1.0)
    val diversity = words.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.length.toDouble / words.length
    val punctDensity = math.min(text.count(".,;:!?".contains(_)).toDouble / text.length * 20.0, 1.0)
    (avgSentLen + diversity + punctDensity) / 3.0
  }

  /** Adaptive token chunker (G3): complexity scales the chunk budget —
    * complex text gets smaller chunks (×0.7), medium ×0.85, simple ×1.0
    * (the reference's three-band rule). */
  def adaptiveTokenChunks(df: DataFrame, idCol: String, textCol: String,
                          maxTokens: Int = 100, overlapTokens: Int = 20): Dataset[Chunk] = {
    val spark = df.sparkSession
    import spark.implicits._
    docs(df, idCol, textCol).flatMap { case (id, text) =>
      if (text == null || text.isEmpty) Iterator.empty
      else {
        val c = complexityScore(text)
        val factor = if (c > 0.7) 0.7 else if (c > 0.4) 0.85 else 1.0
        val budget = math.max((maxTokens * factor).toInt, overlapTokens + 1)
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val out = collection.mutable.ArrayBuffer.empty[Chunk]
        var start = 0
        var idx = 0
        while (start < toks.length) {
          val end = math.min(start + budget, toks.length)
          val t = toks.slice(start, end).mkString(" ")
          out += Chunk(id, idx, start, end, t, end - start, "adaptive")
          idx += 1
          start = if (end >= toks.length) toks.length else end - overlapTokens
        }
        out.iterator
      }
    }
  }

  private val SentenceSplit = "(?<=[.!?])\\s+"

  /**
   * Sentence chunker (G4, day_10/chunkers/sentence_chunker.py:140-234):
   * regex sentence split (the reference's own non-NLTK fallback), group to
   * ≤ maxSentences and ≤ maxWords, step back overlapSentences.
   */
  def sentenceChunks(df: DataFrame, idCol: String, textCol: String,
                     maxSentences: Int = 5, maxWords: Int = 120,
                     overlapSentences: Int = 1, minSentenceChars: Int = 10): Dataset[Chunk] = {
    val spark = df.sparkSession
    import spark.implicits._
    docs(df, idCol, textCol).flatMap { case (id, text) =>
      if (text == null || text.isEmpty) Iterator.empty
      else {
        val sents = text.split(SentenceSplit).map(_.trim).filter(_.length >= minSentenceChars)
        val out = collection.mutable.ArrayBuffer.empty[Chunk]
        var i = 0
        var idx = 0
        while (i < sents.length) {
          var j = i
          var wordSum = 0
          while (j < sents.length && j - i < maxSentences &&
            (j == i || wordSum + sents(j).split("\\s+").length <= maxWords)) {
            wordSum += sents(j).split("\\s+").length
            j += 1
          }
          val t = sents.slice(i, j).mkString(" ")
          out += Chunk(id, idx, i, j, t, t.split("\\s+").count(_.nonEmpty), "sentence")
          idx += 1
          i = if (j >= sents.length) sents.length else math.max(j - overlapSentences, i + 1)
        }
        out.iterator
      }
    }
  }

  /**
   * Semantic sentence chunker (G5,
   * day_10/chunkers/sentence_chunker.py:257-357): embed each sentence,
   * greedily group consecutive candidates whose cosine to the group seed is
   * ≥ `simThreshold`. The greedy order is the reference's (sentence order
   * within one document), and a document's sentences always colocate in one
   * flatMap call — deterministic at any parallelism (SURVEY §7.5 risk 6).
   */
  def semanticChunks(df: DataFrame, idCol: String, textCol: String,
                     simThreshold: Double = 0.7,
                     encoder: Embedder.TextEncoder = Embedder.MockEncoder(),
                     minSentenceChars: Int = 10): Dataset[Chunk] = {
    val spark = df.sparkSession
    import spark.implicits._
    docs(df, idCol, textCol).flatMap { case (id, text) =>
      if (text == null || text.isEmpty) Iterator.empty
      else {
        val sents = text.split(SentenceSplit).map(_.trim).filter(_.length >= minSentenceChars)
        if (sents.isEmpty) Iterator.empty
        else {
          val embs = encoder.encodeBatch(sents.toSeq).map(_.map(_.toDouble)).toArray
          def cos(a: Array[Double], b: Array[Double]): Double = {
            var dot, na, nb = 0.0
            var i = 0
            while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
            if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
          }
          val used = new Array[Boolean](sents.length)
          val out = collection.mutable.ArrayBuffer.empty[Chunk]
          var idx = 0
          var i = 0
          while (i < sents.length) {
            if (!used(i)) {
              val group = collection.mutable.ArrayBuffer(i)
              used(i) = true
              var j = i + 1
              while (j < sents.length) {
                if (!used(j) && cos(embs(i), embs(j)) >= simThreshold) {
                  group += j; used(j) = true
                }
                j += 1
              }
              val t = group.map(sents).mkString(" ")
              out += Chunk(id, idx, group.head, group.last + 1, t,
                t.split("\\s+").count(_.nonEmpty), "semantic")
              idx += 1
            }
            i += 1
          }
          out.iterator
        }
      }
    }
  }

  /** Chunk-id assignment (G9, day_15/main.py:104-127): `{doc_id}_{i}` plus
    * chunk_index / total_chunks metadata columns. */
  def withChunkIds(chunks: Dataset[Chunk]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"))
    chunks.toDF()
      .withColumn("chunk_id", concat(col("doc_id"), lit("_"), col("chunk_index")))
      .withColumn("total_chunks", count(lit(1)).over(w))
  }

  /** Paragraph chunker (G6): split on blank lines, ≥ minChars, group ≤
    * maxParagraphs per chunk. */
  def paragraphChunks(df: DataFrame, idCol: String, textCol: String,
                      maxParagraphs: Int = 3, minChars: Int = 50): Dataset[Chunk] = {
    val spark = df.sparkSession
    import spark.implicits._
    docs(df, idCol, textCol).flatMap { case (id, text) =>
      if (text == null || text.isEmpty) Iterator.empty
      else {
        val paras = text.split("\n\\s*\n").map(_.trim).filter(_.length >= minChars)
        paras.grouped(maxParagraphs).zipWithIndex.map { case (g, idx) =>
          val t = g.mkString("\n\n")
          Chunk(id, idx, idx * maxParagraphs, idx * maxParagraphs + g.length,
            t, t.split("\\s+").count(_.nonEmpty), "paragraph")
        }
      }
    }
  }

  /** Content-type detector (P9, day_10/chunkers/hybrid_chunker.py:27-90):
    * regex battery classifying text as code/table/list/prose. */
  def contentType(text: String): String =
    if (text == null || text.isEmpty) "empty"
    else if (text.contains("```") || text.linesIterator.count(l => l.startsWith("    ") || l.startsWith("\t")) > 2) "code"
    else if (text.linesIterator.count(_.contains("|")) > 2) "table"
    else if (text.linesIterator.count(l => l.trim.matches("^([-*+]|\\d+\\.)\\s.*")) > 2) "list"
    else "prose"

  /** Hybrid chunker (G7): detect content type, route code/table to
    * line-preserving token chunks, lists/prose to sentence or token chunks;
    * merge trailing fragments < minChunkChars. */
  def hybridChunks(df: DataFrame, idCol: String, textCol: String,
                   maxTokens: Int = 100, minChunkChars: Int = 50): Dataset[Chunk] = {
    val spark = df.sparkSession
    import spark.implicits._
    docs(df, idCol, textCol).flatMap { case (id, text) =>
      if (text == null || text.isEmpty) Iterator.empty
      else {
        val ct = contentType(text)
        val headerRe = "(?m)^(#{1,6} .*)$".r
        val base: Seq[Chunk] = ct match {
          case "code" | "table" =>
            // split on lines, group preserving structure
            val lines = text.split("\n")
            lines.grouped(20).zipWithIndex.map { case (g, idx) =>
              val t = g.mkString("\n")
              Chunk(id, idx, 0, 0, t, t.split("\\s+").count(_.nonEmpty), ct)
            }.toSeq
          case _ if headerRe.findFirstIn(text).isDefined =>
            // structure strategy (day_10 hybrid header-aware split): a new
            // section starts at each markdown header; long sections fall
            // back to token grouping within the section
            val lines = text.split("\n")
            val sections = collection.mutable.ArrayBuffer(collection.mutable.ArrayBuffer.empty[String])
            lines.foreach { l =>
              if (l.matches("^#{1,6} .*") && sections.last.nonEmpty)
                sections += collection.mutable.ArrayBuffer(l)
              else sections.last += l
            }
            sections.filter(_.exists(_.trim.nonEmpty)).zipWithIndex.flatMap { case (sec, _) =>
              val t = sec.mkString("\n")
              val toks = t.split("\\s+").filter(_.nonEmpty)
              if (toks.length <= maxTokens) Seq(Chunk(id, 0, 0, 0, t, toks.length, "structure"))
              else toks.grouped(maxTokens).map { g =>
                Chunk(id, 0, 0, 0, g.mkString(" "), g.length, "structure")
              }.toSeq
            }.toSeq
          case _ =>
            val toks = text.split("\\s+").filter(_.nonEmpty)
            toks.grouped(maxTokens).zipWithIndex.map { case (g, idx) =>
              val t = g.mkString(" ")
              Chunk(id, idx, 0, 0, t, g.length, ct)
            }.toSeq
        }
        // post-merge pass: fold chunks smaller than minChunkChars into the previous
        val merged = base.foldLeft(Vector.empty[Chunk]) { (acc, c) =>
          if (acc.nonEmpty && c.text.length < minChunkChars) {
            val last = acc.last
            val t = last.text + " " + c.text
            acc.init :+ last.copy(text = t, n_tokens = t.split("\\s+").count(_.nonEmpty))
          } else acc :+ c
        }
        merged.zipWithIndex.map { case (c, i) => c.copy(chunk_index = i) }.iterator
      }
    }
  }

  /** Chunk statistics (A5): totals and avg/min/max of token and char
    * counts. Averages are `sum(int)/count` raw quotients, not
    * `round(avg, 6)`: the integer sums are exact, so the single double
    * division is bit-identical across engines, while round() diverges on
    * …5e-7 boundaries (the q60 lesson). */
  def chunkStats(chunks: Dataset[Chunk]): DataFrame =
    chunks.toDF().agg(
      count(lit(1)).as("n_chunks"),
      countDistinct(col("doc_id")).as("n_docs"),
      (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"),
      min(col("n_tokens")).as("min_tokens"),
      max(col("n_tokens")).as("max_tokens"),
      (sum(length(col("text"))).cast("double") / count(lit(1))).as("avg_chars"),
      max(length(col("text"))).as("max_chars"))

  /**
   * Word-set coverage of a chunking run (reference
   * day_10/utils/evaluation.py:145-169): per source document, the
   * character coverage ratio `Σ|chunk| / |original|`, the word coverage
   * ratio `|chunk_words ∩ original_words| / |original_words|` over
   * lowercase `\w+` word SETS, and the reference's conservative
   * `coverage_score = min(char, word)`. Character coverage > 1 means
   * overlap regions were double-counted (expected for overlapping
   * chunkers); word coverage < 1 means the chunker DROPPED content.
   *
   * Scale shape: one hash aggregation over the chunk rows (map-side
   * combined on the doc key) joined to the originals on that same key —
   * per-document word sets are bounded by document size, so the arrays
   * never exceed what a single original document already holds. All
   * ratios are exact int/int quotients — bit-identical across engines,
   * no rounding.
   */
  def coverageReport(chunks: DataFrame, docs: DataFrame, idCol: String,
                     chunkTextCol: String = "text",
                     docTextCol: String = "text"): DataFrame = {
    val wordSet = (t: Column) =>
      array_distinct(regexp_extract_all(lower(t), lit("\\w+"), lit(0)))
    val perDoc = chunks.groupBy(col(idCol))
      .agg(sum(length(col(chunkTextCol))).as("total_chunk_chars"),
        array_distinct(flatten(collect_list(wordSet(col(chunkTextCol)))))
          .as("__cw"))
    val orig = docs.select(col(idCol),
      length(col(docTextCol)).as("total_original_chars"),
      wordSet(col(docTextCol)).as("__ow"))
    val ratio = (num: Column, den: Column) =>
      when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))
    orig.join(perDoc, Seq(idCol))
      .withColumn("character_coverage_ratio",
        ratio(col("total_chunk_chars"), col("total_original_chars")))
      .withColumn("word_coverage_ratio",
        ratio(size(array_intersect(col("__cw"), col("__ow"))), size(col("__ow"))))
      .withColumn("coverage_score",
        least(col("character_coverage_ratio"), col("word_coverage_ratio")))
      .drop("__cw", "__ow")
  }
}
