package graft

import graft.operators.KnnSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KnnSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val e = Tables(spark, TestSpark.sfDir, "embeddings").cache()

  test("single-query topK is ordered and correctly ranked") {
    val q = Tables.queryVector(spark, TestSpark.sfDir, 0L)
    val rows = KnnSearch.topK(e.where(col("vec_id") =!= 0), "vec_id", "embedding", q, 10).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    assert(!rows.map(_.getLong(0)).contains(0L))
  }

  test("batch heap path agrees with single-query expression path") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L)
    val qs = ids.map(id => id -> Tables.queryVector(spark, TestSpark.sfDir, id))
    val batch = KnnSearch.topKBatch(e, "vec_id", "embedding", qs, 10, KnnSearch.Cosine, excludeSelf = true)
      .select("query_id", "doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val single = ids.flatMap { id =>
      KnnSearch.topK(e.where(col("vec_id") =!= id), "vec_id", "embedding",
          Tables.queryVector(spark, TestSpark.sfDir, id), 10)
        .collect().zipWithIndex.map { case (r, i) => (id, r.getLong(0), i + 1) }
    }.toSet
    assert(batch === single)
  }

  test("broadcast crossJoin path agrees with heap path") {
    val queries = e.where(col("vec_id") < 5)
    val joined = KnnSearch.topKJoin(queries, "vec_id", "embedding",
        e.where(col("vec_id") >= 5), "vec_id", "embedding", 10, KnnSearch.Cosine)
      .select("query_id", "doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val qs = (0L until 5L).map(id => id -> Tables.queryVector(spark, TestSpark.sfDir, id))
    val heap = KnnSearch.topKBatch(e.where(col("vec_id") >= 5), "vec_id", "embedding", qs, 10)
      .select("query_id", "doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(joined === heap)
  }

  test("L2 and cosine rank identically on normalized vectors") {
    val q = Tables.queryVector(spark, TestSpark.sfDir, 7L)
    val docs = e.where(col("vec_id") =!= 7)
    val cos = KnnSearch.topK(docs, "vec_id", "embedding", q, 10, KnnSearch.Cosine)
      .collect().map(_.getLong(0)).toSeq
    val l2 = KnnSearch.topK(docs, "vec_id", "embedding", q, 10, KnnSearch.L2)
      .collect().map(_.getLong(0)).toSeq
    assert(cos === l2) // embeddings are unit-norm ⇒ d² = 2 − 2·cos
  }
}
