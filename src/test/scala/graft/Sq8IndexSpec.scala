package graft

import graft.operators.{KnnSearch, ServingIndex}
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar-quantized serving tier: per-dim affine uint8 codes, ADC
  * search over dequantized stripes (FAISS IndexScalarQuantizer regime —
  * the 4×-less-memory tier under the day_6 serving benchmarks). */
class Sq8IndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 32
  private val n = 2000

  private def corpus = ClusteredFixture.corpus(spark, n, dim)
  private def queries = ClusteredFixture.queries(25, dim)

  test("quantization round-trip error is bounded by step/2 per dimension") {
    val docs = corpus.cache(); docs.count()
    val idx = ServingIndex.buildSq8(docs, dim)
    val originals = docs.collect().toMap
    val decoded = idx.slabs.collect().flatMap { slab =>
      slab.ids.indices.map { i =>
        val v = Array.tabulate(dim)(j =>
          idx.vmin(j) + (slab.codes(i * dim + j) & 0xFF) * idx.vstep(j))
        (slab.ids(i), v)
      }
    }
    assert(decoded.length === n)
    decoded.foreach { case (id, v) =>
      val orig = originals(id)
      for (j <- 0 until dim) {
        val tol = math.max(idx.vstep(j) / 2f, 1e-6f) * 1.001f // rounding slack
        assert(math.abs(v(j) - orig(j)) <= tol,
          s"id=$id dim=$j decoded=${v(j)} orig=${orig(j)} step=${idx.vstep(j)}")
      }
    }
    docs.unpersist(); idx.slabs.unpersist()
  }

  test("SQ8 search recall@10 vs exact is high on clustered data, all metrics") {
    val docs = corpus.cache(); docs.count()
    val flat = ServingIndex.buildFlat(docs, dim)
    val sq8 = ServingIndex.buildSq8(docs, dim)
    for (metric <- Seq[KnnSearch.Metric](KnnSearch.L2, KnnSearch.Cosine, KnnSearch.InnerProduct)) {
      val exact = flat.search(queries, 10, metric).map { case (q, a) => q -> a.map(_._2).toSet }.toMap
      val quant = sq8.search(queries, 10, metric)
      val recall = quant.map { case (q, arr) =>
        arr.map(_._2).count(exact(q).contains).toDouble / exact(q).size
      }.sum / quant.length
      assert(recall >= 0.9, s"$metric recall@10 = $recall")
    }
    docs.unpersist(); flat.slabs.unpersist(); sq8.slabs.unpersist()
  }

  test("constant dimensions dequantize exactly and memory is 1 byte/dim") {
    val sc = spark.sparkContext
    val d = 4
    val rows = sc.parallelize(Seq(
      (1L, Array(7.5f, 1.0f, 0.0f, -3.0f)),
      (2L, Array(7.5f, 2.0f, 0.0f, 5.0f)),
      (3L, Array(7.5f, 3.0f, 0.0f, 13.0f))), 2)
    val idx = ServingIndex.buildSq8(rows, d)
    assert(idx.numVectors === 3)
    assert(idx.bytesPerVector === 8 + d)
    assert(idx.vstep(0) === 0f) // constant dim → exact
    assert(idx.vstep(2) === 0f)
    val res = idx.search(Array((0L, Array(7.5f, 1.1f, 0.0f, -2.9f))), 1, KnnSearch.L2)
    assert(res.head._2.head._2 === 1L)
    idx.slabs.unpersist()
  }

  test("IVF+SQ8 exhaustive probe equals flat SQ8 exactly; partial probe keeps recall") {
    val docs = corpus.cache(); docs.count()
    val sq8 = ServingIndex.buildSq8(docs, dim)
    val ivfSq8 = ServingIndex.buildIvfSq8(docs, dim, nlist = 20, iterations = 10)
    // same quantizer + exhaustive probes ⇒ identical results, any metric
    for (metric <- Seq[KnnSearch.Metric](KnnSearch.L2, KnnSearch.Cosine)) {
      val flatRes = sq8.search(queries, 10, metric).map { case (q, a) => q -> a.toSeq }.toMap
      val ivfRes = ivfSq8.search(queries, 10, nprobe = 20, metric)
      ivfRes.foreach { case (q, a) => assert(a.toSeq === flatRes(q), s"$metric q=$q") }
    }
    // pruned probes keep high recall on clustered data vs the exact flat
    val flat = ServingIndex.buildFlat(docs, dim)
    val exact = flat.search(queries, 10, KnnSearch.L2)
      .map { case (q, a) => q -> a.map(_._2).toSet }.toMap
    val pruned = ivfSq8.search(queries, 10, nprobe = 5, KnnSearch.L2)
    val recall = pruned.map { case (q, a) =>
      a.map(_._2).count(exact(q).contains).toDouble / exact(q).size
    }.sum / pruned.length
    assert(recall >= 0.7, s"ivf+sq8 recall@10 = $recall with nprobe 5/20")
    assert(ivfSq8.bytesPerVector === 8 + dim)
    docs.unpersist(); sq8.slabs.unpersist(); ivfSq8.slabs.unpersist(); flat.slabs.unpersist()
  }

  test("dirty rows (null / wrong dim) are dropped like buildFlat") {
    val sc = spark.sparkContext
    val rows = sc.parallelize(Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, null: Array[Float]),
      (3L, Array(1.0f)),
      (4L, Array(3.0f, 4.0f))), 2)
    val idx = ServingIndex.buildSq8(rows, 2)
    assert(idx.numVectors === 2)
    assert(idx.slabs.collect().flatMap(_.ids).toSet === Set(1L, 4L))
    idx.slabs.unpersist()
  }
}
