package graft

import graft.operators.Chunkers
import org.scalatest.funsuite.AnyFunSuite

class ChunkersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val longText = (1 to 120).map(i => s"word$i").mkString(" ") // ~900 chars
  private def one = Seq((0L, longText)).toDF("doc_id", "text")

  test("fixedCharChunks covers the text with the right stride") {
    val chunks = Chunkers.fixedCharChunks(one, "doc_id", "text", size = 200, overlap = 50)
      .orderBy("chunk_index").collect()
    assert(chunks.head.getAs[Int]("start_char") === 0)
    chunks.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Int]("start_char") - a.getAs[Int]("start_char") === 150)
      case _ =>
    }
    // overlap: consecutive chunks share their 50-char boundary region
    val t0 = chunks(0).getAs[String]("text")
    val t1 = chunks(1).getAs[String]("text")
    assert(t0.substring(150) === t1.substring(0, 50))
    // coverage: stitching de-overlapped chunks reproduces the text
    val stitched = chunks.map(_.getAs[String]("text")).zipWithIndex.map {
      case (t, 0) => t
      case (t, _) => t.drop(50)
    }.mkString
    assert(stitched === longText)
  }

  test("charChunks (day_15 semantics) snaps to sentence boundary past midpoint") {
    val text = ("a" * 600) + ". " + ("b" * 600)
    val chunks = Chunkers.charChunks(Seq((0L, text)).toDF("doc_id", "text"),
      "doc_id", "text", size = 1000, overlap = 200).collect().sortBy(_.chunk_index)
    assert(chunks.head.end_char === 601) // cut at the '.' (index 600) + 1
    assert(chunks.head.text.endsWith("."))
    // next chunk starts 200 back from the cut
    assert(chunks(1).start_char === 401)
  }

  test("charChunks with no '.' uses hard cut and overlap") {
    val text = "x" * 2500
    val chunks = Chunkers.charChunks(Seq((0L, text)).toDF("doc_id", "text"),
      "doc_id", "text", size = 1000, overlap = 200).collect().sortBy(_.chunk_index)
    assert(chunks.map(_.start_char).toSeq === Seq(0, 800, 1600))
    assert(chunks.last.end_char === 2500)
  }

  test("tokenChunks respects maxTokens and overlap carry-back") {
    val chunks = Chunkers.tokenChunks(one, "doc_id", "text", maxTokens = 50, overlapTokens = 10)
      .collect().sortBy(_.chunk_index)
    assert(chunks.forall(_.n_tokens <= 50))
    assert(chunks.map(_.start_char).toSeq === Seq(0, 40, 80))  // start token idx steps by 40
    assert(chunks.last.end_char === 120)
    // token coverage: every token index appears in some chunk
    val covered = chunks.flatMap(c => c.start_char until c.end_char).toSet
    assert(covered === (0 until 120).toSet)
  }

  test("sentenceChunks groups by sentence and respects maxSentences") {
    val text = (1 to 12).map(i => s"This is sentence number $i.").mkString(" ")
    val chunks = Chunkers.sentenceChunks(
        Seq((0L, text)).toDF("doc_id", "text"),
        "doc_id", "text", maxSentences = 5, maxWords = 1000, overlapSentences = 0)
      .collect().sortBy(_.chunk_index)
    assert(chunks.length === 3) // 12 sentences / 5 per chunk
    assert(chunks.head.text.startsWith("This is sentence number 1."))
    assert(chunks.forall(_.chunk_type === "sentence"))
  }

  test("paragraphChunks filters short paragraphs and groups") {
    val text = Seq("p" * 60, "tiny", "q" * 60, "r" * 60, "s" * 60).mkString("\n\n")
    val chunks = Chunkers.paragraphChunks(
        Seq((0L, text)).toDF("doc_id", "text"),
        "doc_id", "text", maxParagraphs = 2, minChars = 50)
      .collect().sortBy(_.chunk_index)
    assert(chunks.length === 2) // 4 valid paragraphs / 2 per chunk
    assert(!chunks.exists(_.text.contains("tiny")))
  }

  test("hybridChunks routes by content type and merges fragments") {
    val code = (1 to 30).map(i => s"    line$i()").mkString("\n")
    val prose = (1 to 250).map(i => s"w$i").mkString(" ")
    val df = Seq((0L, code), (1L, prose)).toDF("doc_id", "text")
    val chunks = Chunkers.hybridChunks(df, "doc_id", "text", maxTokens = 100).collect()
    assert(chunks.filter(_.doc_id == 0L).forall(_.chunk_type === "code"))
    assert(chunks.filter(_.doc_id == 1L).forall(_.chunk_type === "prose"))
    assert(chunks.filter(_.doc_id == 1L).forall(_.text.length >= 50)) // merged fragments
  }

  test("hybridChunks preserves a header-only trailing section (merges forward, no text lost)") {
    // a markdown doc whose last header has an EMPTY body (found by the
    // q58 oracle at sf0.001, r15): the header-only section must still
    // reach the output — chunkers never drop input text — as a
    // sub-minChunkChars fragment folded into the previous chunk
    val text = "# Intro\none two three four five six seven eight nine ten\n# Body\n"
    val out = Chunkers.hybridChunks(Seq((0L, text)).toDF("doc_id", "text"),
      "doc_id", "text", maxTokens = 12, minChunkChars = 50).collect()
    assert(out.length === 1, out.mkString("; "))
    assert(out.head.text ===
      "# Intro\none two three four five six seven eight nine ten # Body")
    assert(out.head.n_tokens === 14)
  }

  test("complexity score ranks dense prose above repetitive text") {
    val simple = ("word " * 100).trim
    val complex = (1 to 10).map(i => s"Unique$i terms punctuate, clauses; differ!").mkString(" ")
    assert(Chunkers.complexityScore(complex) > Chunkers.complexityScore(simple))
    assert(Chunkers.complexityScore("") === 0.0)
  }

  test("adaptive chunker shrinks the budget for complex text (G3 bands)") {
    val simple = ("word " * 300).trim
    val complex = (1 to 60).map(i => s"Unique$i terms punctuate, clauses; differ now!").mkString(" ")
    val df = Seq((0L, simple), (1L, complex)).toDF("doc_id", "text")
    val chunks = Chunkers.adaptiveTokenChunks(df, "doc_id", "text", maxTokens = 100, overlapTokens = 10)
      .collect()
    val simpleMax = chunks.filter(_.doc_id == 0L).map(_.n_tokens).max
    val complexMax = chunks.filter(_.doc_id == 1L).map(_.n_tokens).max
    assert(simpleMax === 100)      // factor 1.0
    assert(complexMax < 100)       // scaled down by complexity
  }

  test("hybrid structure strategy splits at markdown headers (G7)") {
    val text = "# Intro\nsome prose here for the intro section padding words\n" +
      "# Methods\nmethod details with more words to fill the section\n" +
      "# Results\nresults commentary closing the document nicely here"
    val chunks = Chunkers.hybridChunks(Seq((0L, text)).toDF("doc_id", "text"),
        "doc_id", "text", maxTokens = 100, minChunkChars = 10)
      .collect().sortBy(_.chunk_index)
    assert(chunks.length === 3)
    assert(chunks.forall(_.chunk_type === "structure"))
    assert(chunks.map(_.text.linesIterator.next()).toSeq ===
      Seq("# Intro", "# Methods", "# Results"))
  }

  test("chunkStats aggregates over real documents") {
    val docs = Tables(spark, TestSpark.sfDir, "documents").limit(100)
    val stats = Chunkers.chunkStats(
      Chunkers.tokenChunks(docs, "doc_id", "text", 30, 5)).head()
    assert(stats.getAs[Long]("n_chunks") > 0)
    assert(stats.getAs[Long]("n_docs") === 100L)
    assert(stats.getAs[Int]("max_tokens") <= 30)
  }

  test("coverageReport: hand-computed word and char coverage") {
    // original: 6 distinct words, 35 chars; chunks drop "fox" entirely
    // and repeat "the quick" -> chunk words {the,quick,brown,dog,runs}
    val docs = Seq((1L, "the quick brown fox the dog runs on")).toDF("doc_id", "text")
    val chunks = Seq(
      (1L, "the quick brown"),
      (1L, "the quick dog runs on")).toDF("doc_id", "text")
    val r = Chunkers.coverageReport(chunks, docs, "doc_id").head()
    assert(r.getAs[Int]("total_original_chars") === 35)
    assert(r.getAs[Long]("total_chunk_chars") === 36L)
    // original words: {the,quick,brown,fox,dog,runs,on} = 7; chunks cover 6
    assert(r.getAs[Double]("word_coverage_ratio") === 6.0 / 7)
    assert(r.getAs[Double]("character_coverage_ratio") === 36.0 / 35)
    assert(r.getAs[Double]("coverage_score") === 6.0 / 7) // min of the two
  }

  test("coverageReport: lossless chunking scores full word coverage") {
    val chunks = Chunkers.fixedCharChunks(one, "doc_id", "text", 200, 50)
      .toDF().select($"doc_id", $"text")
    val r = Chunkers.coverageReport(chunks, one, "doc_id").head()
    assert(r.getAs[Double]("word_coverage_ratio") === 1.0)
    assert(r.getAs[Double]("character_coverage_ratio") >= 1.0) // overlap double-counts
    assert(r.getAs[Double]("coverage_score") === 1.0)
  }
}
