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
