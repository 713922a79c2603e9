package graft

import graft.operators.{HnswIndex, KnnSearch, ServingIndex}
import org.scalatest.funsuite.AnyFunSuite

class HnswIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 32
  private val n = 2000

  private def corpus = {
    val nClusters = 20
    val d = dim // local copy: the RDD closure must not capture the suite
    val centers = Array.tabulate(nClusters) { c =>
      val r = new java.util.Random(42L + c)
      Array.fill(d)(r.nextGaussian() * 5.0)
    }
    spark.sparkContext.parallelize(0L until n.toLong, 8).map { id =>
      val ctr = centers((id % nClusters).toInt)
      val r = new java.util.Random(1000L + id)
      (id, Array.tabulate(d)(i => (ctr(i) + r.nextGaussian()).toFloat))
    }
  }

  private def queries = (0 until 25).map { q =>
    val r = new java.util.Random(9000L + q)
    (q.toLong, Array.fill(dim)(r.nextGaussian().toFloat * 5.0f))
  }.toArray

  test("hnsw recall@10 vs exact beats the day_6 FAISS HNSW bar") {
    val docs = corpus.cache(); docs.count()
    val flat = ServingIndex.buildFlat(docs, dim)
    val hnsw = HnswIndex.build(docs, dim, m = 16, efConstruction = 64, KnnSearch.L2)
    val exact = flat.search(queries, 10, KnnSearch.L2)
    val approx = hnsw.search(queries, 10, efSearch = 64)
    val exactSets = exact.map { case (q, arr) => q -> arr.map(_._2).toSet }.toMap
    val recall = approx.map { case (q, arr) =>
      arr.map(_._2).count(exactSets(q).contains).toDouble / exactSets(q).size
    }.sum / approx.length
    // baseline FAISS HNSWFlat M=32 recall@10 on large = 0.485; sharded
    // graphs at ef=64 should be near-exact on this corpus
    assert(recall >= 0.9, s"recall@10 = $recall")
    flat.slabs.unpersist(); hnsw.shards.unpersist(); docs.unpersist()
  }

  test("deterministic: two builds over the same partitioning agree") {
    val docs = corpus.cache(); docs.count()
    val a = HnswIndex.build(docs, dim, m = 8, efConstruction = 32, KnnSearch.L2)
    val b = HnswIndex.build(docs, dim, m = 8, efConstruction = 32, KnnSearch.L2)
    val ra = a.search(queries, 5, efSearch = 32).map { case (q, arr) => (q, arr.toSeq) }.toSeq
    val rb = b.search(queries, 5, efSearch = 32).map { case (q, arr) => (q, arr.toSeq) }.toSeq
    assert(ra === rb)
    a.shards.unpersist(); b.shards.unpersist(); docs.unpersist()
  }

  test("empty partitions and fewer docs than k are handled") {
    val tiny = spark.sparkContext.parallelize(
      Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f))), 8)
    val hnsw = HnswIndex.build(tiny, 2, m = 4, efConstruction = 8, KnnSearch.L2)
    val res = hnsw.search(Array((0L, Array(1f, 0f))), k = 10, efSearch = 8)
    assert(res.length === 1)
    assert(res(0)._2.map(_._2).toSeq === Seq(1L, 3L, 2L))
    hnsw.shards.unpersist()
  }

  test("cosine metric: reported scores are cosine similarities, ranked desc") {
    val docs = corpus.cache(); docs.count()
    val hnsw = HnswIndex.build(docs, dim, m = 16, efConstruction = 64, KnnSearch.Cosine)
    val res = hnsw.search(queries.take(5), 10, efSearch = 64)
    res.foreach { case (_, arr) =>
      assert(arr.length === 10)
      assert(arr.map(_._1).toSeq === arr.map(_._1).sortBy(s => -s).toSeq)
      arr.foreach { case (s, _) => assert(s >= -1.001f && s <= 1.001f) }
    }
    // spot-check score values against the exact kernel's cosine
    val flat = ServingIndex.buildFlat(docs, dim)
    val exact = flat.search(queries.take(5), 10, KnnSearch.Cosine)
    val exactTop = exact.map { case (q, arr) => q -> arr.head }.toMap
    res.foreach { case (q, arr) =>
      if (arr.head._2 == exactTop(q)._2)
        assert(math.abs(arr.head._1 - exactTop(q)._1) < 1e-5f)
    }
    flat.slabs.unpersist(); hnsw.shards.unpersist(); docs.unpersist()
  }
}
