package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact k-nearest-neighbor search — the reference's flagship operator
 * (brute force: day_4/day4_complete.py:58-79; SQL `ORDER BY embedding <=> q
 * LIMIT k`: day_9/database/vector_ops.py:133-198; FAISS FlatL2:
 * day_6/day6_complete.py:84-103).
 *
 * Scale design (100 TB):
 *  - Single query → pure scan + scored projection + TakeOrderedAndProject:
 *    one whole-stage-codegen span, no shuffle, no materialization. On a
 *    cluster this is embarrassingly parallel over parquet splits.
 *  - Query batch → broadcast the (always small) query side and compute
 *    per-partition bounded top-k heaps in a single pass over the documents
 *    (`mapPartitions`), emitting only `numPartitions × |Q| × k` candidate
 *    rows; the global reduce over those candidates is negligible. Never
 *    shuffles the document table and never materializes |docs|×|Q| scores —
 *    this is what survives a 1000-executor scan of 100 TB.
 */
object KnnSearch {

  /**
   * The ONE float32 distance kernel family every F32 consumer shares
   * (`Metric.scoreF32`, the [[ServingIndex]] slab scans, the
   * [[HnswIndex]] graph kernel) — so bench/serving scores are identical
   * across all of them by construction.
   *
   * Loops run 4 independent accumulators: strict left-to-right float
   * summation serializes the FP pipeline (each add waits ~4 cycles on the
   * previous), which is the dominant cost of a dim-384 scan; four
   * parallel partial sums expose the ILP/SIMD the JIT can actually use,
   * measured ~2× on the day_6 exact kernel. The combine order
   * ((s0+s1)+(s2+s3), tail folded into s0) is fixed and shared. The
   * DOUBLE kernels (`Metric.score`) keep strict sequential order — they
   * are the DuckDB-oracle-parity path and must stay bit-identical to
   * `list_*` semantics.
   */
  private[operators] object F32Kernels {
    /** Σ(q(i)−v(off+i))² — squared L2 over n dims. */
    def l2sq(q: Array[Float], v: Array[Float], off: Int, n: Int): Float = {
      var s0, s1, s2, s3 = 0.0f
      var i = 0
      val lim = n - 3
      while (i < lim) {
        val d0 = q(i) - v(off + i); val d1 = q(i + 1) - v(off + i + 1)
        val d2 = q(i + 2) - v(off + i + 2); val d3 = q(i + 3) - v(off + i + 3)
        s0 += d0 * d0; s1 += d1 * d1; s2 += d2 * d2; s3 += d3 * d3
        i += 4
      }
      while (i < n) { val d = q(i) - v(off + i); s0 += d * d; i += 1 }
      (s0 + s1) + (s2 + s3)
    }

    /** Σ q(i)·v(off+i) over n dims. */
    def dot(q: Array[Float], v: Array[Float], off: Int, n: Int): Float = {
      var s0, s1, s2, s3 = 0.0f
      var i = 0
      val lim = n - 3
      while (i < lim) {
        s0 += q(i) * v(off + i); s1 += q(i + 1) * v(off + i + 1)
        s2 += q(i + 2) * v(off + i + 2); s3 += q(i + 3) * v(off + i + 3)
        i += 4
      }
      while (i < n) { s0 += q(i) * v(off + i); i += 1 }
      (s0 + s1) + (s2 + s3)
    }

    /** Cosine similarity with the shared zero-norm guard. */
    def cosine(q: Array[Float], v: Array[Float], off: Int, n: Int): Float = {
      var d0, d1, d2, d3 = 0.0f
      var x0, x1, x2, x3 = 0.0f
      var y0, y1, y2, y3 = 0.0f
      var i = 0
      val lim = n - 3
      while (i < lim) {
        val a0 = q(i); val b0 = v(off + i)
        val a1 = q(i + 1); val b1 = v(off + i + 1)
        val a2 = q(i + 2); val b2 = v(off + i + 2)
        val a3 = q(i + 3); val b3 = v(off + i + 3)
        d0 += a0 * b0; d1 += a1 * b1; d2 += a2 * b2; d3 += a3 * b3
        x0 += a0 * a0; x1 += a1 * a1; x2 += a2 * a2; x3 += a3 * a3
        y0 += b0 * b0; y1 += b1 * b1; y2 += b2 * b2; y3 += b3 * b3
        i += 4
      }
      while (i < n) {
        val a = q(i); val b = v(off + i)
        d0 += a * b; x0 += a * a; y0 += b * b; i += 1
      }
      val dd = (d0 + d1) + (d2 + d3)
      val nq = (x0 + x1) + (x2 + x3)
      val nv = (y0 + y1) + (y2 + y3)
      if (nq == 0.0f || nv == 0.0f) 0.0f
      else (dd / math.sqrt(nq.toDouble * nv)).toFloat
    }
  }

  sealed trait Metric {
    /** true ⇒ larger score is better. */
    def descending: Boolean
    /** Both sides pre-widened to double: the JIT auto-vectorizes the pure
      * double-double loops; mixed float→double widening in the inner loop
      * defeats SIMD. Accumulation order matches the Catalyst expressions
      * (and the DuckDB oracle) bit-for-bit. */
    def score(q: Array[Double], v: Array[Double]): Double
    /** float32 accumulation — twice the SIMD lanes; same arithmetic FAISS
      * uses. For serving/bench paths where bit-parity with the double
      * oracle is not required. */
    def scoreF32(q: Array[Float], v: Array[Float]): Float
    def column(query: Column, doc: Column): Column
  }

  case object Cosine extends Metric {
    val descending = true
    def score(q: Array[Double], v: Array[Double]): Double = {
      var dot, nq, nv = 0.0
      val n = math.min(q.length, v.length)
      var i = 0
      while (i < n) { val x = q(i); val y = v(i); dot += x * y; nq += x * x; nv += y * y; i += 1 }
      if (nq == 0.0 || nv == 0.0) 0.0 else dot / (math.sqrt(nq) * math.sqrt(nv))
    }
    def scoreF32(q: Array[Float], v: Array[Float]): Float =
      F32Kernels.cosine(q, v, 0, math.min(q.length, v.length))
    def column(query: Column, doc: Column): Column = cosineSimilarity(query, doc)
  }

  case object InnerProduct extends Metric {
    val descending = true
    def score(q: Array[Double], v: Array[Double]): Double = {
      var dot = 0.0
      val n = math.min(q.length, v.length)
      var i = 0
      while (i < n) { dot += q(i) * v(i); i += 1 }
      dot
    }
    def scoreF32(q: Array[Float], v: Array[Float]): Float =
      F32Kernels.dot(q, v, 0, math.min(q.length, v.length))
    def column(query: Column, doc: Column): Column = dotProduct(query, doc)
  }

  case object L2 extends Metric {
    val descending = false
    def score(q: Array[Double], v: Array[Double]): Double = {
      var s = 0.0
      val n = math.min(q.length, v.length)
      var i = 0
      while (i < n) { val d = q(i) - v(i); s += d * d; i += 1 }
      math.sqrt(s)
    }
    def scoreF32(q: Array[Float], v: Array[Float]): Float =
      math.sqrt(F32Kernels.l2sq(q, v, 0, math.min(q.length, v.length)).toDouble).toFloat
    def column(query: Column, doc: Column): Column = l2Distance(query, doc)
  }

  /** Merge two best-first-sorted top-k arrays into one (two-way merge,
    * keep k). Associative + commutative under the (score, id) total order,
    * so it is safe as a `reduceByKey` combiner: the per-query merge runs
    * map-side on each executor and the driver only ever sees |Q|×k rows —
    * never the partitions×|Q|×k candidate set. */
  private[graft] def mergeTopK(desc: Boolean, k: Int)(
      a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      val takeA = j >= b.length || (i < a.length && {
        val c = java.lang.Double.compare(a(i)._1, b(j)._1)
        if (c != 0) { if (desc) c > 0 else c < 0 } else a(i)._2 < b(j)._2
      })
      if (takeA) { out(o) = a(i); i += 1 } else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  private[graft] def mergeTopKF32(desc: Boolean, k: Int)(
      a: Array[(Float, Long)], b: Array[(Float, Long)]): Array[(Float, Long)] = {
    val out = new Array[(Float, Long)](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      val takeA = j >= b.length || (i < a.length && {
        val c = java.lang.Float.compare(a(i)._1, b(j)._1)
        if (c != 0) { if (desc) c > 0 else c < 0 } else a(i)._2 < b(j)._2
      })
      if (takeA) { out(o) = a(i); i += 1 } else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  /**
   * Top-k for ONE query vector: scan + scored projection + global top-k.
   * Catalyst plans the limit as TakeOrderedAndProject (no full sort) and the
   * scoring stays inside WholeStageCodegen. Ties broken by ascending id.
   */
  def topK(docs: DataFrame, idCol: String, vecCol: String,
           query: Array[Float], k: Int, metric: Metric = Cosine): DataFrame = {
    val score = metric.column(typedlit(query), col(vecCol)).as("score")
    val ord =
      if (metric.descending) Seq(col("score").desc, col(idCol).asc)
      else Seq(col("score").asc, col(idCol).asc)
    docs.select(col(idCol), score).orderBy(ord: _*).limit(k)
  }

  /**
   * Top-k per query for a BATCH of query vectors. Queries are collected to
   * the driver (they are the small side by construction — reference
   * workloads: 100 queries vs 50k docs) and broadcast; documents are
   * scanned once with per-partition bounded heaps.
   *
   * Output: (query_id, doc_id, score, rank), rank 1..k per query,
   * deterministic tie-break on doc id.
   */
  def topKBatch(docs: DataFrame, idCol: String, vecCol: String,
                queries: Seq[(Long, Array[Float])], k: Int,
                metric: Metric = Cosine, excludeSelf: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    topKBatchRdd(
      spark,
      docs.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
        .as[(Long, Array[Float])].rdd,
      queries, k, metric, excludeSelf)
  }

  /**
   * RDD-object form of [[topKBatch]]: for a memory-resident "index"
   * (an RDD of (id, vector) cached as JVM objects) the scan skips columnar
   * deserialization entirely — the serving shape of the day_6 workload.
   */
  def topKBatchRdd(spark: org.apache.spark.sql.SparkSession,
                   docs: org.apache.spark.rdd.RDD[(Long, Array[Float])],
                   queries: Seq[(Long, Array[Float])], k: Int,
                   metric: Metric = Cosine, excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val qs: Array[(Long, Array[Double])] =
      queries.map { case (id, v) => (id, v.map(_.toDouble)) }.toArray
    val bc = spark.sparkContext.broadcast(qs)
    val desc = metric.descending

    val candidates = docs
      .mapPartitions { it =>
        val queries = bc.value
        // one bounded heap per query; heap root = worst kept element so the
        // comparator keeps the k best under (score, id) total order.
        val heaps = queries.map { _ =>
          // ordering: "a before b" means a is WORSE (so the head is worst).
          implicit val worstFirst: Ordering[(Double, Long)] =
            new Ordering[(Double, Long)] {
              def compare(a: (Double, Long), b: (Double, Long)): Int = {
                val c = if (desc) java.lang.Double.compare(a._1, b._1)
                        else java.lang.Double.compare(b._1, a._1)
                if (c != 0) c else java.lang.Long.compare(b._2, a._2)
              }
            }
          collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst.reverse)
        }
        var widened = new Array[Double](0)
        it.foreach { case (docId, vec) =>
          if (vec != null) {
            // widen once per document; all queries then run double-double
            if (widened.length != vec.length) widened = new Array[Double](vec.length)
            var wi = 0
            while (wi < vec.length) { widened(wi) = vec(wi); wi += 1 }
            var qi = 0
            while (qi < queries.length) {
              if (excludeSelf && queries(qi)._1 == docId) { qi += 1 }
              else {
              val s = metric.score(queries(qi)._2, widened)
              val h = heaps(qi)
              if (h.size < k) h.enqueue((s, docId))
              else {
                val worst = h.head
                val better =
                  if (desc) s > worst._1 || (s == worst._1 && docId < worst._2)
                  else s < worst._1 || (s == worst._1 && docId < worst._2)
                if (better) { h.dequeue(); h.enqueue((s, docId)) }
              }
              qi += 1
              }
            }
          }
        }
        // emit ONE best-first-sorted array per query per partition
        // (dequeueAll drains worst-first under the heap's ordering)
        heaps.iterator.zipWithIndex.map { case (h, qi) =>
          (queries(qi)._1, h.dequeueAll.reverse.toArray)
        }
      }

    // Distributed global reduce: reduceByKey on query_id merges the bounded
    // per-partition arrays map-side (combiner = sorted two-way merge), so
    // each executor ships ≤ |Q| arrays of k and the driver collects exactly
    // |Q|×k rows — at 10⁶ input splits the candidate set never converges on
    // the driver. The reduce side has only |Q| distinct keys, so cap its
    // partition count there — inheriting the doc RDD's (possibly 10⁶)
    // partition count would schedule that many near-empty reduce tasks.
    val reduceParts = math.max(1, math.min(queries.size, candidates.getNumPartitions))
    val merged = candidates.reduceByKey(mergeTopK(desc, k)(_, _), reduceParts)
      .collect()
      .flatMap { case (qid, arr) =>
        arr.iterator.zipWithIndex.map { case ((s, d), i) => (qid, d, s, i + 1) }
      }.toSeq
    merged.toDF("query_id", "doc_id", "score", "rank")
      .orderBy($"query_id", $"rank")
  }

  /**
   * Float32 serving kernel: identical structure to [[topKBatchRdd]] but
   * accumulating in float (FAISS's arithmetic — twice the SIMD lanes).
   * For latency-critical serving; ranking can differ from the double
   * kernel only on near-exact score ties.
   */
  def topKBatchRddF32(spark: org.apache.spark.sql.SparkSession,
                      docs: org.apache.spark.rdd.RDD[(Long, Array[Float])],
                      queries: Seq[(Long, Array[Float])], k: Int,
                      metric: Metric = Cosine, excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._
    val qs: Array[(Long, Array[Float])] = queries.toArray
    val bc = spark.sparkContext.broadcast(qs)
    val desc = metric.descending

    val candidates = docs.mapPartitions { it =>
      val queries = bc.value
      val heaps = queries.map { _ =>
        val worstFirst: Ordering[(Float, Long)] = new Ordering[(Float, Long)] {
          def compare(a: (Float, Long), b: (Float, Long)): Int = {
            val c = if (desc) java.lang.Float.compare(a._1, b._1)
                    else java.lang.Float.compare(b._1, a._1)
            if (c != 0) c else java.lang.Long.compare(b._2, a._2)
          }
        }
        collection.mutable.PriorityQueue.empty[(Float, Long)](worstFirst.reverse)
      }
      it.foreach { case (docId, vec) =>
        if (vec != null) {
          var qi = 0
          while (qi < queries.length) {
            if (!(excludeSelf && queries(qi)._1 == docId)) {
              val s = metric.scoreF32(queries(qi)._2, vec)
              val h = heaps(qi)
              if (h.size < k) h.enqueue((s, docId))
              else {
                val worst = h.head
                val better =
                  if (desc) s > worst._1 || (s == worst._1 && docId < worst._2)
                  else s < worst._1 || (s == worst._1 && docId < worst._2)
                if (better) { h.dequeue(); h.enqueue((s, docId)) }
              }
            }
            qi += 1
          }
        }
      }
      heaps.iterator.zipWithIndex.map { case (h, qi) =>
        (qs(qi)._1, h.dequeueAll.reverse.toArray)
      }
    }

    // same distributed merge as [[topKBatchRdd]]; see the comment there
    val reduceParts = math.max(1, math.min(qs.length, candidates.getNumPartitions))
    val merged = candidates.reduceByKey(mergeTopKF32(desc, k)(_, _), reduceParts)
      .collect()
      .flatMap { case (qid, arr) =>
        arr.iterator.zipWithIndex.map { case ((s, d), i) => (qid, d, s.toDouble, i + 1) }
      }.toSeq
    merged.toDF("query_id", "doc_id", "score", "rank")
      .orderBy($"query_id", $"rank")
  }

  /**
   * Generic DataFrame×DataFrame k-NN join (both sides distributed):
   * broadcast-crossJoin + windowed rank. Use when the query side is a real
   * table but still broadcast-able; for larger query sides, go through
   * [[AnnIndex]] (IVF) instead of this exact path.
   */
  def topKJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
               docs: DataFrame, dIdCol: String, dVecCol: String,
               k: Int, metric: Metric = Cosine): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("__qvec"))
    val d = docs.select(col(dIdCol).as("doc_id"), col(dVecCol).as("__dvec"))
    val scored = d.crossJoin(broadcast(q))
      .withColumn("score", metric.column(col("__qvec"), col("__dvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(
      (if (metric.descending) col("score").desc else col("score").asc), col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "score", "rank")
  }
}
