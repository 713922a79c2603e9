package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions (SURVEY §2.8 F7/F14/F16/F17 and the
 * training-data-pipeline operators: token counting, quality scoring,
 * language-ID, fingerprinting). Everything here is pure `Column`
 * composition — codegen'd builtin expressions, no UDFs — so the operators
 * inline into whole-stage codegen and push down/prune like any native
 * expression.
 *
 * Reference semantics: word/char counts day_10/utils/text_processor.py:136-153,
 * stopword language heuristic :156-167, complexity score
 * day_10/chunkers/token_chunker.py:237-267, md5 cache key
 * day_10/embedders/embedding_pipeline.py:238-250.
 */
object TextFunctions {

  /** Whitespace tokenization — the approximate tokenizer (SURVEY §7.5 risk 2:
    * BPE parity is explicitly out of scope; counts are approximate). */
  def words(text: Column): Column = split(text, "\\s+")

  /** Blank-filtered word tokens — THE shared tokenizer of the curation
    * operators (QualityFilters / Packing / Decontaminate) and their
    * DuckDB oracles (`list_filter(string_split_regex(trim(text),'\s+'),
    * w -> length(w) > 0)`): change it here and the oracle SQL together,
    * never in one operator alone. Null-safe (null text → no tokens). */
  def wordTokens(text: Column): Column =
    filter(split(trim(coalesce(text, lit(""))), "\\s+"), w => length(w) > 0)

  def wordCount(text: Column): Column = size(words(text))

  /** GPT-2-style BPE pre-tokenizer pattern (the published pattern minus
    * its `\s+(?!\S)` lookahead — RE2/DuckDB has no lookahead, and the
    * whole point is ONE pattern both engines run identically):
    * contractions, space-prefixed letter runs, digit runs, punctuation
    * runs, whitespace runs. Counts land much closer to a real BPE
    * tokenizer's than whitespace counts do (digits and punctuation
    * split off), which is what a token-budget estimate needs. */
  val BpeIshPattern: String =
    "'[sdmt]|'ll|'ve|'re| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish pre-tokens of `text` (see [[BpeIshPattern]]); null-safe. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit(BpeIshPattern), lit(0))

  /** Approximate BPE token count — the whitespace count's sharper twin. */
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  def charCount(text: Column): Column = length(text)

  /** Characters of punctuation per character of text. */
  def punctRatio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[^.,;:!?]", ""))
    when(length(text) > 0, punct.cast("double") / length(text)).otherwise(lit(0.0))
  }

  /** Fraction of tokens that are (English) stopwords — F14's hit-count
    * heuristic expressed as a ratio. */
  val EnStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column = {
    val ws = words(lower(text))
    val hits = size(filter(ws, w => array_contains(lit(EnStopwords.toArray), w)))
    when(size(ws) > 0, hits.cast("double") / size(ws)).otherwise(lit(0.0))
  }

  /** Mean token length (complexity-score ingredient, F16). */
  def avgWordLen(text: Column): Column = {
    val ws = words(text)
    when(size(ws) > 0,
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(ws))
      .otherwise(lit(0.0))
  }

  /**
   * Composite document quality score in [0,1] — the reference's
   * length/stopword/punctuation recipe (day_10 chunk-quality evaluation,
   * reference day_10/utils/evaluation.py:22-64) as one deterministic
   * expression: reward reasonable length and stopword presence, penalize
   * punctuation soup.
   */
  def qualityScore(text: Column): Column = {
    val lengthTerm = least(wordCount(text).cast("double") / lit(100.0), lit(1.0))
    val stopTerm = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val punctTerm = lit(1.0) - least(punctRatio(text) * lit(10.0), lit(1.0))
    lengthTerm * lit(0.5) + stopTerm * lit(0.3) + punctTerm * lit(0.2)
  }

  /** Stopword-hit language guess (F14): ≥ `minHits` hits from a language's
    * marker list wins; ties broken by fixed language order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
  )

  def langHits(text: Column, markers: Seq[String]): Column =
    size(filter(words(lower(text)), w => array_contains(lit(markers.toArray), w)))

  def langGuess(text: Column, minHits: Int = 1): Column = {
    val scored = LangMarkers.map { case (l, ms) => (l, langHits(text, ms)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("unknown"): Column) { case ((l, hits), acc) =>
      when(hits === best && best >= minHits, lit(l)).otherwise(acc)
    }
  }

  /** Distinct character n-grams of lowercased text (spaces included —
    * they carry word-boundary signal, the core of the Cavnar–Trenkle
    * n-gram language-ID method). Null/short text → empty set. */
  def charNgrams(text: Column, n: Int): Column = {
    val t = lower(coalesce(text, lit("")))
    when(length(t) >= n,
      array_distinct(transform(sequence(lit(0), length(t) - n),
        i => t.substr(i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-language marker TRIGRAM profiles (hand-picked high-frequency
    * trigrams incl. boundary spaces, ASCII-only so every engine agrees
    * on case folding). Word markers catch clean prose; trigram profiles
    * also catch text where tokenization is unreliable (no spaces
    * around punctuation, concatenations) — the n-gram heuristic's
    * reason to exist. */
  val TrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", "ing", " an", "nd ", "and", "ed "),
    "de" -> Seq("er ", "en ", "ch ", "der", "ie ", "sch", "ein", "und"),
    "fr" -> Seq(" de", "es ", "le ", "ent", "de ", "ion", "que", "les"),
    "es" -> Seq(" de", "de ", "os ", "la ", "el ", "que", "ado", " la"),
  )

  /** Character-trigram overlap score against one profile. */
  def trigramScore(text: Column, profile: Seq[String]): Column =
    size(array_intersect(charNgrams(text, 3), lit(profile.toArray)))

  /** n-gram language guess: highest distinct-trigram overlap wins, ties
    * broken by profile order, below `minScore` → "unknown". */
  def langGuessNgram(text: Column, minScore: Int = 1): Column = {
    val scored = TrigramProfiles.map { case (l, p) => (l, trigramScore(text, p)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("unknown"): Column) { case ((l, s), acc) =>
      when(s === best && best >= minScore, lit(l)).otherwise(acc)
    }
  }

  /** Document-id validity (F19 — `^[A-Za-z0-9_.-]+$`,
    * day_9/models/schemas.py:20-24). */
  def isValidDocId(c: Column): Column = c.rlike("^[A-Za-z0-9_.-]+$")

  /** Truncate with ellipsis (F20, day_12/src/main.py:99). */
  def truncateEllipsis(c: Column, maxLen: Int): Column =
    when(length(c) > maxLen,
      concat(substring(c, 1, maxLen - 3), lit("..."))).otherwise(c)

  /** Conjunctive metadata containment over a MapType column (P3 — JSONB
    * `@>` for flat maps): every (k,v) of `filter` must match. */
  def metadataContains(meta: Column, filterKv: Map[String, String]): Column =
    filterKv.map { case (k, v) => element_at(meta, k) === lit(v) }
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed
    * text (F17's md5 cache key; the exact-dedup primitive). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Polynomial rolling-hash fingerprint (codegen'd [[RollingHash]]
    * expression — codepoint Rabin–Karp, base 31 mod 1e9+7). */
  def rollingFingerprint(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(RollingHash(expression(text)))
  }

  /** Register SQL names (`SELECT rolling_hash(text) ...`). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("rolling_hash", es => RollingHash(es.head), "scala_udf")
  }

  /** Sliding word n-gram shingles: ["a b c", "b c d", ...]. */
  def shingles(text: Column, n: Int): Column = {
    val ws = words(text)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", ws)))
  }

  /**
   * MinHash signature over md5-hashed shingles: component i is
   * min over shingles of md5(shingle ∥ "#" ∥ i). md5 keeps the signature
   * reproducible in any engine (the DuckDB oracle computes the identical
   * signature); the LSH banding in [[graft.operators.Dedup]] buckets on
   * concatenated components.
   */
  def minhashSignature(text: Column, numHashes: Int, shingleLen: Int = 3): Column = {
    val sh = array_distinct(shingles(text, shingleLen))
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => md5(concat(s, lit("#"), i.cast("string"))))))
  }

  /**
   * 64-bit SimHash of a token list: bit b of the signature is 1 iff
   * Σ_tokens sign(bit b of hash64(token)) > 0. Near-duplicate docs (small
   * token-set edits) agree on most bits, so blocking on 16-bit bands finds
   * hamming≤3 pairs with 4 bands. Plain-Scala hot loop (64 bit-votes per
   * token) — called from a typed map in [[graft.operators.Dedup]].
   */
  def simhash64(tokens: Array[String]): Long = {
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      // two 32-bit murmur seeds → one deterministic 64-bit token hash
      val lo = scala.util.hashing.MurmurHash3.stringHash(tokens(t), 0x9747b28c).toLong & 0xFFFFFFFFL
      val hi = scala.util.hashing.MurmurHash3.stringHash(tokens(t), 0x85ebca6b).toLong & 0xFFFFFFFFL
      val h = (hi << 32) | lo
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}
