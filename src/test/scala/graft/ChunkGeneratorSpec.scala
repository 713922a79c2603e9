package graft

import graft.functions.TextGenerators
import graft.operators.Chunkers
import org.scalatest.funsuite.AnyFunSuite

class ChunkGeneratorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("LATERAL VIEW chunk_text matches Chunkers.fixedCharChunks") {
    TextGenerators.register(spark)
    Tables(spark, TestSpark.sfDir, "documents").limit(50)
      .createOrReplaceTempView("docs_cg")
    val viaSql = spark.sql(
      """SELECT doc_id, c.chunk_index, c.start_char, c.chunk_text
        |FROM docs_cg
        |LATERAL VIEW chunk_text(text, 200, 50) c AS chunk_index, start_char, chunk_text
        |""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    val viaOp = Chunkers.fixedCharChunks(
        Tables(spark, TestSpark.sfDir, "documents").limit(50),
        "doc_id", "text", 200, 50)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_index"),
        r.getAs[Int]("start_char"), r.getAs[String]("text"))).toSet
    assert(viaSql === viaOp)
    assert(viaSql.nonEmpty)
  }

  test("generator handles empty and null text") {
    TextGenerators.register(spark)
    import spark.implicits._
    Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "abc"))
      .toDF("id", "t").createOrReplaceTempView("edge_cg")
    val rows = spark.sql(
      "SELECT id, c.chunk_text FROM edge_cg LATERAL VIEW chunk_text(t, 10, 2) c AS i, s, chunk_text")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(3L))
    assert(rows.head.getString(1) === "abc")
  }
}
