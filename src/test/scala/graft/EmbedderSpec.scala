package graft

import graft.operators.Embedder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbedderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark engines process data"),
    (1L, "vectors live in embedding space"),
    (2L, "spark engines process data")  // same text as 0
  ).toDF("doc_id", "text")

  test("mock embeddings are deterministic, unit-norm, content-keyed") {
    val out = Embedder.embed(docs, "doc_id", "text", Embedder.MockEncoder(32))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(out(0L) === out(2L))      // same content → same vector
    assert(out(0L) !== out(1L))
    val norm = math.sqrt(out(0L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(out(0L).length === 32)
  }

  test("batching boundary does not change results") {
    val big = (0L until 100L).map(i => (i, s"document number $i")).toDF("doc_id", "text")
    val b1 = Embedder.embed(big, "doc_id", "text", Embedder.MockEncoder(16), batchSize = 7)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val b2 = Embedder.embed(big, "doc_id", "text", Embedder.MockEncoder(16), batchSize = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(b1 === b2)
  }

  test("incremental embed reuses the cache for known fingerprints") {
    val cached = Embedder.embed(docs.where($"doc_id" < 2), "doc_id", "text")
    val incoming = Seq(
      (10L, "spark engines process data"),   // cache hit (same canonical text)
      (11L, "a brand new document")          // miss → computed
    ).toDF("doc_id", "text")
    val out = Embedder.embedIncremental(incoming, cached, "doc_id", "text")
    assert(out.count() === 2)
    val m = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](r.fieldIndex("embedding")).toList).toMap
    val orig = cached.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Float](r.fieldIndex("embedding")).toList).toMap
    assert(m(10L) === orig(0L)) // identical vector reused from cache
  }
}
