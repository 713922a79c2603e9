package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the vector math the reference engine uses
 * everywhere (cosine / dot / L2 / normalize — cf. reference
 * day_2/noramalization.py:103-119, day_5/day5_complete.py:95-113,
 * day_9/database/vector_ops.py:142-152 `<=> <-> <#>`).
 *
 * Design notes:
 *  - All accumulate in `double` regardless of the stored element type
 *    (float32 storage, float64 math — same contract as NumPy upcasting and
 *    DuckDB's list_* functions on DOUBLE[]), summing sequentially
 *    left-to-right so results are bit-reproducible and oracle-comparable.
 *  - Full `doGenCode` implementations keep these inside whole-stage codegen:
 *    a brute-force scan with a cosine projection stays a single
 *    WholeStageCodegen span (scan → project → TakeOrderedAndProject).
 *  - Null array => null result (`nullIntolerant`); null *elements* are
 *    treated as 0.0 so a sparse/padded vector doesn't poison a whole row.
 */
object VectorExpressions {
  private[functions] def checkVec(dt: DataType, side: String): Option[String] = dt match {
    case ArrayType(FloatType | DoubleType, _) => None
    case other => Some(s"$side must be array<float> or array<double>, got ${other.catalogString}")
  }

  /** Java source for `(double) arr[i]` honoring the element type. */
  private[functions] def genGet(arr: String, et: DataType, i: String): String =
    s"(double) ${CodeGenerator.getValue(arr, et, i)}"

  private[functions] def elemAt(a: ArrayData, et: DataType, i: Int): Double =
    if (a.isNullAt(i)) 0.0
    else et match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }
}

trait VectorPairExpression extends BinaryExpression {
  import VectorExpressions._
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  protected def leftElem: DataType = left.dataType.asInstanceOf[ArrayType].elementType
  protected def rightElem: DataType = right.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(left.dataType, "left").orElse(checkVec(right.dataType, "right")) match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some(msg) => TypeCheckResult.TypeCheckFailure(s"$prettyName: $msg")
    }

  /** Loop body combining per-element products into named accumulators. */
  protected def foldPair(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var acc0, acc1, acc2 = 0.0
    val (le, re) = (leftElem, rightElem)
    while (i < n) {
      val x = elemAt(a, le, i)
      val y = elemAt(b, re, i)
      acc0 += x * y; acc1 += x * x; acc2 += y * y
      i += 1
    }
    finish(acc0, acc1, acc2)
  }
  /** acc0 = Σxy, acc1 = Σx², acc2 = Σy². */
  protected def finish(dot: Double, nx: Double, ny: Double): Double
  /** Java expression producing the final double from the 3 accumulators. */
  protected def genFinish(dot: String, nx: String, ny: String): String

  override def nullSafeEval(l: Any, r: Any): Any =
    foldPair(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : ${genGet(a, leftElem, i)};
         |  double $y = $b.isNullAt($i) ? 0.0 : ${genGet(b, rightElem, i)};
         |  $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
         |}
         |${ev.value} = ${genFinish(dot, nx, ny)};
       """.stripMargin
    })
}

/** Σ xᵢyᵢ — pgvector `<#>` is the negative of this (day_9/database/vector_ops.py:146). */
case class DotProduct(left: Expression, right: Expression) extends VectorPairExpression {
  override def prettyName: String = "dot_product"
  override protected def finish(dot: Double, nx: Double, ny: Double): Double = dot
  override protected def genFinish(dot: String, nx: String, ny: String): String = dot
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** dot/(‖x‖‖y‖); 0.0 when either norm is 0 (reference's zero-vector guard, day_2/noramalization.py:113-117). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorPairExpression {
  override def prettyName: String = "cosine_similarity"
  override protected def finish(dot: Double, nx: Double, ny: Double): Double =
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  override protected def genFinish(dot: String, nx: String, ny: String): String =
    s"($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** √Σ(xᵢ−yᵢ)² — pgvector `<->` (day_9/database/vector_ops.py:149). */
case class L2Distance(left: Expression, right: Expression) extends VectorPairExpression {
  override def prettyName: String = "l2_distance"
  // reuse accumulators: dot=Σxy, nx=Σx², ny=Σy² ⇒ d² = nx - 2dot + ny.
  // NOT used — the algebraic form loses precision; we accumulate diffs directly.
  override protected def finish(dot: Double, nx: Double, ny: Double): Double =
    throw new IllegalStateException("unused")
  override protected def genFinish(dot: String, nx: String, ny: String): String = ""

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var s = 0.0
    val (le, re) = (leftElem, rightElem)
    while (i < n) {
      val d = VectorExpressions.elemAt(a, le, i) - VectorExpressions.elemAt(b, re, i)
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ($a.isNullAt($i) ? 0.0 : ${VectorExpressions.genGet(a, leftElem, i)})
         |            - ($b.isNullAt($i) ? 0.0 : ${VectorExpressions.genGet(b, rightElem, i)});
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** ‖x‖₂ (day_2/noramalization.py:73). */
case class L2Norm(child: Expression) extends UnaryExpression {
  import VectorExpressions._
  override def prettyName: String = "l2_norm"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, "input") match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some(msg) => TypeCheckResult.TypeCheckFailure(s"$prettyName: $msg")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var i = 0; var s = 0.0
    val et = elem
    while (i < a.numElements()) { val x = elemAt(a, et, i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s"); val x = ctx.freshName("x")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : ${genGet(a, elem, i)};
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/**
 * x / ‖x‖₂ as array<double>; zero vector maps to itself (reference returns
 * the vector unchanged when norm is 0 — day_2/noramalization.py:75-77).
 */
case class L2Normalize(child: Expression) extends UnaryExpression {
  import VectorExpressions._
  override def prettyName: String = "l2_normalize"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, "input") match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some(msg) => TypeCheckResult.TypeCheckFailure(s"$prettyName: $msg")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    val et = elem
    var i = 0; var s = 0.0
    while (i < n) { val x = elemAt(a, et, i); out(i) = x; s += x * x; i += 1 }
    val norm = math.sqrt(s)
    if (norm != 0.0) { i = 0; while (i < n) { out(i) /= norm; i += 1 } }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val tmp = ctx.freshName("tmp"); val norm = ctx.freshName("norm")
      s"""
         |int $n = $a.numElements();
         |double[] $tmp = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $tmp[$i] = $a.isNullAt($i) ? 0.0 : ${genGet(a, elem, i)};
         |  $s += $tmp[$i] * $tmp[$i];
         |}
         |double $norm = java.lang.Math.sqrt($s);
         |if ($norm != 0.0) for (int $i = 0; $i < $n; $i++) $tmp[$i] /= $norm;
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($tmp);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
