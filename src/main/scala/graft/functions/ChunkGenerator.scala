package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL/UDTF surface for chunking (SURVEY §2.11's Generator tier): a
 * one-row→many Catalyst `Generator`, so fixed-stride char chunking is
 * usable from SQL:
 *
 * {{{
 * SELECT doc_id, c.chunk_index, c.chunk_text
 * FROM documents LATERAL VIEW chunk_text(text, 200, 50) c AS chunk_index, start_char, chunk_text
 * }}}
 *
 * Same semantics as `Chunkers.fixedCharChunks` (windows of `size` chars
 * every `size − overlap`). Register with [[TextGenerators.register]].
 * CodegenFallback is fine here: generators are flatMap-shaped and the
 * per-row work dominates dispatch.
 */
case class ChunkText(text: Expression, size: Expression, overlap: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, size, overlap)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("start_char", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && size.dataType == IntegerType &&
        overlap.dataType == IntegerType && size.foldable && overlap.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "chunk_text(text STRING, size INT literal, overlap INT literal)")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Iterator.empty
    val s = t.asInstanceOf[UTF8String].toString
    val sz = size.eval(input).asInstanceOf[Int]
    val ov = overlap.eval(input).asInstanceOf[Int]
    require(ov < sz, "overlap must be < size")
    val stride = sz - ov
    if (s.isEmpty) return Iterator.empty
    val nChunks = math.max(math.ceil((s.length - ov).toDouble / stride).toInt, 1)
    (0 until nChunks).iterator.flatMap { i =>
      val start = i * stride
      if (start >= s.length) Iterator.empty
      else {
        val chunk = s.substring(start, math.min(start + sz, s.length))
        Iterator.single(InternalRow(i, start, UTF8String.fromString(chunk)))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), size = newChildren(1), overlap = newChildren(2))
}

object TextGenerators {
  /** Register SQL generator functions on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "chunk_text", es => ChunkText(es(0), es(1), es(2)), "scala_udf")
}
