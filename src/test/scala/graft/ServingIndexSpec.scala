package graft

import graft.operators.{KnnSearch, ServingIndex}
import org.scalatest.funsuite.AnyFunSuite

class ServingIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 32
  private val n = 2000

  private def corpus = ClusteredFixture.corpus(spark, n, dim)
  private def queries = ClusteredFixture.queries(25, dim)

  test("flat fused search agrees with the reference F32 kernel") {
    val docs = corpus.cache(); docs.count()
    val idx = ServingIndex.buildFlat(docs, dim)
    for (metric <- Seq[KnnSearch.Metric](KnnSearch.L2, KnnSearch.Cosine, KnnSearch.InnerProduct)) {
      val fused = idx.search(queries, k = 10, metric)
        .flatMap { case (qid, arr) => arr.map { case (s, d) => (qid, d, s) } }.toSeq
      val ref = KnnSearch.topKBatchRddF32(spark, docs, queries.toSeq, 10, metric)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2).toFloat)).toSeq
      // scores to 1e-4 at every rank — the fused scan uses the SIMD
      // kernels when available, whose lane-order reassociation drifts
      // from the scalar family by last ulps; an id may differ at a rank
      // ONLY when the two entries are inside that drift (a legitimate
      // near-tie swap), never on a real score gap
      assert(fused.map(_._1) === ref.map(_._1), metric.toString)
      fused.zip(ref).foreach { case ((q, d, sf), (_, dr, sr)) =>
        assert(math.abs(sf - sr) <= 1e-4f,
          if (d == dr) s"$metric q=$q doc=$d: $sf vs $sr"
          else s"$metric q=$q swap $d vs $dr outside drift: $sf vs $sr")
      }
    }
    idx.slabs.unpersist(); docs.unpersist()
  }

  test("flat search: fewer docs than k returns all docs ranked") {
    val tiny = spark.sparkContext.parallelize(
      Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f))), 4)
    val idx = ServingIndex.buildFlat(tiny, 2)
    val res = idx.search(Array((0L, Array(1f, 0f))), k = 10, KnnSearch.L2)
    assert(res.length === 1)
    assert(res(0)._2.map(_._2).toSeq === Seq(1L, 3L, 2L))
    idx.slabs.unpersist()
  }

  test("ivf with nprobe = nlist is exhaustive: agrees with flat exactly") {
    val docs = corpus.cache(); docs.count()
    val flat = ServingIndex.buildFlat(docs, dim)
    val ivf = ServingIndex.buildIvf(docs, dim, nlist = 16, iterations = 5)
    val a = flat.search(queries, 10, KnnSearch.L2)
      .flatMap { case (q, arr) => arr.map { case (s, d) => (q, d, s) } }.toSeq
    val b = ivf.search(queries, 10, nprobe = 16, KnnSearch.L2)
      .flatMap { case (q, arr) => arr.map { case (s, d) => (q, d, s) } }.toSeq
    assert(a === b)
    flat.slabs.unpersist(); ivf.slabs.unpersist(); docs.unpersist()
  }

  test("ivf partial probe keeps high recall on clustered data") {
    val docs = corpus.cache(); docs.count()
    val flat = ServingIndex.buildFlat(docs, dim)
    val ivf = ServingIndex.buildIvf(docs, dim, nlist = 20, iterations = 10)
    val exact = flat.search(queries, 10, KnnSearch.L2)
    val approx = ivf.search(queries, 10, nprobe = 5, KnnSearch.L2)
    val exactSets = exact.map { case (q, arr) => q -> arr.map(_._2).toSet }.toMap
    val hits = approx.map { case (q, arr) =>
      arr.map(_._2).count(exactSets(q).contains).toDouble / exactSets(q).size
    }
    val recall = hits.sum / hits.length
    assert(recall >= 0.7, s"recall@10 = $recall with nprobe 5/20")
    flat.slabs.unpersist(); ivf.slabs.unpersist(); docs.unpersist()
  }

  test("HNSW-routed probe selection matches the exact centroid ranking") {
    val docs = corpus.cache(); docs.count()
    val ivf = ServingIndex.buildIvf(docs, dim, nlist = 20, iterations = 10)
    val exact = ivf.search(queries, 10, nprobe = 5, KnnSearch.L2)
    // generous ef → the router's probe set should reproduce the exact
    // ranking on 20 centroids, making results identical
    val routed = ivf.search(queries, 10, nprobe = 5, KnnSearch.L2,
      routed = true, routeEf = 64)
    val exactRes = exact.map { case (q, a) => q -> a.toSeq }.toMap
    val same = routed.count { case (q, a) => a.toSeq == exactRes(q) }
    assert(same >= queries.length - 1, s"only $same/${queries.length} matched")
    // default ef still reaches high recall vs the exact-probe search
    val routedDef = ivf.search(queries, 10, nprobe = 5, KnnSearch.L2, routed = true)
    val exactSets2 = exact.map { case (q, a) => q -> a.map(_._2).toSet }.toMap
    val rec = routedDef.map { case (q, a) =>
      a.map(_._2).count(exactSets2(q).contains).toDouble / exactSets2(q).size
    }.sum / queries.length
    assert(rec >= 0.9, s"routed recall vs exact-probe = $rec")
    ivf.slabs.unpersist(); docs.unpersist()
  }

  test("ivf slabs are cluster-major with consistent offsets") {
    val docs = corpus
    val ivf = ServingIndex.buildIvf(docs, dim, nlist = 8, iterations = 3)
    val slabs = ivf.slabs.collect()
    assert(slabs.map(_.ids.length).sum === n)
    slabs.foreach { s =>
      assert(s.offsets.length === 9)
      assert(s.offsets.head === 0 && s.offsets.last === s.ids.length)
      assert(s.data.length === s.ids.length * dim)
    }
    ivf.slabs.unpersist()
  }
}
