package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst text expressions beyond what `functions._` composition
 * can express efficiently.
 *
 * `RollingHash` is the document-fingerprinting primitive of the
 * training-data-pipeline tier: a codepoint-level polynomial (Rabin–Karp)
 * hash h = Σ cpᵢ·B^(n−1−i) mod P with B=31, P=1e9+7 — the classic
 * rolling-hash family, evaluated left-to-right so both the JVM and the
 * DuckDB oracle (`list_reduce` over `unicode()` codepoints) produce the
 * identical value. Complements the md5 canonical-form fingerprint
 * ([[TextFunctions.fingerprint]], reference
 * day_10/embedders/embedding_pipeline.py:238-250): the polynomial form is
 * incrementally updatable over a sliding window, which is what winnowing /
 * content-defined chunking pipelines need at corpus scale.
 */
object TextExpressions {
  final val RollingBase = 31L
  final val RollingMod = 1000000007L

  /** Seed for the gram-hash kernel below (any fixed value works — the
    * hashes are engine-internal multiplicity keys, never surfaced). */
  final val GramSeed = 42L

  /** Static kernel for [[GramRepetitionStats]]: word bigram/trigram
    * repetition statistics of ONE token array in one tight loop — hash
    * each token once (XXH64 over its UTF-8 bytes), derive gram keys by
    * hash-combining adjacent token hashes (b_i = XXH64(h_{i+1}, seed =
    * h_i); t_i = XXH64(h_{i+2}, seed = b_i) — the chained-seed form, so
    * ["ab","c"] and ["a","bc"] cannot alias), then sort each key array
    * and scan it for total / duplicate / longest-run counts. O(m log m)
    * per document with NO per-gram expression-tree evaluation — the
    * `transform`+`slice`+`xxhash64` higher-order form computed the same
    * statistics 20× slower at 500k documents (HOF lambdas are
    * interpreted per element and sit outside whole-stage codegen).
    * A WITHIN-document XXH64 collision (≈ m²/2⁶⁵) is the only way a
    * count can drift from true gram multiplicity.
    *
    * Returns (n_bigrams, n_dup_bigrams, n_top_bigram, n_trigrams,
    * n_dup_trigrams, n_top_trigram) with the trigram triple null when
    * m < 3 and ALL fields null when m < 2 — callers filter on the
    * non-null pair exactly like an inner bigram⋈trigram join would. */
  def gramRepetitionStats(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.InternalRow = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val m = arr.numElements()
    val out = new Array[Any](6)
    if (m >= 2) {
      val h = new Array[Long](m)
      var i = 0
      while (i < m) {
        val s = arr.getUTF8String(i)
        h(i) = if (s == null) GramSeed
          else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, GramSeed)
        i += 1
      }
      val big = new Array[Long](m - 1)
      i = 0
      while (i < m - 1) { big(i) = XXH64.hashLong(h(i + 1), h(i)); i += 1 }
      if (m >= 3) {
        val tri = new Array[Long](m - 2)
        i = 0
        while (i < m - 2) { tri(i) = XXH64.hashLong(h(i + 2), big(i)); i += 1 }
        writeOrderStats(tri, out, 3)
      }
      writeOrderStats(big, out, 0)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  /** Sort + single scan: total, duplicates (Σ(count−1)), longest run. */
  private def writeOrderStats(a: Array[Long], out: Array[Any], at: Int): Unit = {
    java.util.Arrays.sort(a)
    var dups = 0L; var best = 1L; var run = 1L
    var i = 1
    while (i < a.length) {
      if (a(i) == a(i - 1)) { run += 1; dups += 1; if (run > best) best = run }
      else run = 1
      i += 1
    }
    out(at) = a.length.toLong; out(at + 1) = dups; out(at + 2) = best
  }

  /** Static kernel shared by interpreted eval and generated code (a Scala
    * object with no companion class gets Java static forwarders, so
    * codegen'd Java calls this directly — the expression stays inside
    * whole-stage codegen). Iterates CODEPOINTS, not UTF-16 units, matching
    * DuckDB's `unicode()` per `string_split(s, '')` element. */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * RollingBase + cp) % RollingMod
      i += Character.charCount(cp)
    }
    h
  }
}

/** Polynomial rolling-hash fingerprint of a string column (LongType).
  * Null string → null; empty string → 0. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def prettyName: String = "rolling_hash"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.rollingHash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Word-gram repetition statistics of a token array (Gopher repetition
  * rules' inner kernel) — struct of six BIGINTs:
  * (n_bigrams, n_dup_bigrams, n_top_bigram,
  *  n_trigrams, n_dup_trigrams, n_top_trigram).
  * Trigram triple null below 3 tokens; all null below 2. One codegen'd
  * call per row into [[TextExpressions.gramRepetitionStats]]'s tight
  * loop — see its Scaladoc for why this beats the higher-order-function
  * composition by ~20× at corpus scale. */
case class GramRepetitionStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "gram_repetition_stats"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType), StructField("n_dup_bigrams", LongType),
    StructField("n_top_bigram", LongType), StructField("n_trigrams", LongType),
    StructField("n_dup_trigrams", LongType), StructField("n_top_trigram", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextExpressions.gramRepetitionStats(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextExpressions.gramRepetitionStats($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
