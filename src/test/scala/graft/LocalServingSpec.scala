package graft

import graft.operators.{HnswIndex, KnnSearch, LocalServing, ServingIndex}
import org.scalatest.funsuite.AnyFunSuite

/**
 * The driver-resident serving tier must be result-IDENTICAL to the
 * distributed slab tiers it is collected from — same kernels, same
 * bounded-heap tie-breaks, same merge — so every test here asserts exact
 * equality of (query, rank, id, score) sequences, not recall bounds.
 */
class LocalServingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 32
  private val n = 2000

  private def corpus = ClusteredFixture.corpus(spark, n, dim)
  private def queries = ClusteredFixture.queries(25, dim)

  private def flatten(res: Array[(Long, Array[(Float, Long)])]) =
    res.flatMap { case (q, arr) => arr.map { case (s, d) => (q, d, s) } }.toSeq

  test("local flat equals distributed flat for every metric") {
    val docs = corpus.cache(); docs.count()
    val dist = ServingIndex.buildFlat(docs, dim)
    val local = LocalServing.flatFrom(dist)
    assert(local.numVectors === n)
    for (metric <- Seq[KnnSearch.Metric](KnnSearch.L2, KnnSearch.Cosine, KnnSearch.InnerProduct)) {
      assert(flatten(local.search(queries, 10, metric)) ===
             flatten(dist.search(queries, 10, metric)), metric.toString)
    }
    dist.slabs.unpersist(); docs.unpersist()
  }

  test("local ivf equals distributed ivf at partial and full probe") {
    val docs = corpus.cache(); docs.count()
    val dist = ServingIndex.buildIvf(docs, dim, nlist = 20, iterations = 10)
    val local = LocalServing.ivfFrom(dist)
    assert(local.numVectors === n)
    assert(local.nlist === 20)
    for (nprobe <- Seq(3, 20)) {
      assert(flatten(local.search(queries, 10, nprobe, KnnSearch.L2)) ===
             flatten(dist.search(queries, 10, nprobe, KnnSearch.L2)), s"nprobe=$nprobe")
    }
    dist.slabs.unpersist(); docs.unpersist()
  }

  test("local sq8 equals distributed sq8") {
    val docs = corpus.cache(); docs.count()
    val dist = ServingIndex.buildSq8(docs, dim)
    val local = LocalServing.sq8From(dist)
    assert(local.numVectors === n)
    assert(flatten(local.search(queries, 10, KnnSearch.L2)) ===
           flatten(dist.search(queries, 10, KnnSearch.L2)))
    dist.slabs.unpersist(); docs.unpersist()
  }

  test("local hnsw equals distributed hnsw (same shard graphs)") {
    val docs = corpus.cache(); docs.count()
    val dist = HnswIndex.build(docs, dim, m = 8, efConstruction = 32,
      KnnSearch.L2, numShards = 4)
    val local = LocalServing.hnswFrom(dist)
    assert(local.numVectors === n)
    assert(flatten(local.search(queries, 10, efSearch = 48)) ===
           flatten(dist.search(queries, 10, efSearch = 48)))
    dist.shards.unpersist(); docs.unpersist()
  }

  test("budget gate refuses an over-budget corpus instead of collecting") {
    val docs = corpus.cache(); docs.count()
    val dist = ServingIndex.buildFlat(docs, dim)
    val e = intercept[IllegalArgumentException] {
      LocalServing.flatFrom(dist, maxBytes = 1024L)
    }
    assert(e.getMessage.contains("distributed slab tier"))
    dist.slabs.unpersist(); docs.unpersist()
  }

  test("k = 0 and k > corpus behave like the distributed tier") {
    val tiny = spark.sparkContext.parallelize(
      Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f))), 2)
    val dist = ServingIndex.buildFlat(tiny, 2)
    val local = LocalServing.flatFrom(dist)
    val q = Array((0L, Array(1f, 0f)))
    assert(local.search(q, 0, KnnSearch.L2)(0)._2.isEmpty)
    assert(local.search(q, 10, KnnSearch.L2)(0)._2.map(_._2).toSeq === Seq(1L, 3L, 2L))
    dist.slabs.unpersist()
  }
}
