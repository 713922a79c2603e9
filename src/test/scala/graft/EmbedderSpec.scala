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

  test("mock embeddings are deterministic, bounded, content-keyed") {
    val out = Embedder.embed(docs, "doc_id", "text", Embedder.MockEncoder(32))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(out(0L) === out(2L))      // same content → same vector
    assert(out(0L) !== out(1L))
    // md5-uniform components live in [-0.5, 0.5)
    assert(out(0L).forall(x => x >= -0.5f && x < 0.5f))
    assert(out(0L).length === 32)
    // golden: component j = int(md5(text#j)[:13], 16) / 2^52 − 0.5
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("spark engines process data#0".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 13)
    val expected = (java.lang.Long.parseLong(hex, 16) / 9007199254740992.0 - 0.5).toFloat
    assert(out(0L).head === expected)
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
