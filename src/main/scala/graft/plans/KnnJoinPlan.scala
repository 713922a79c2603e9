package graft.plans

import graft.operators.KnnSearch
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/**
 * The k-NN join as a first-class Catalyst operator (SURVEY §7.4's "custom
 * LogicalPlan + Rule + SparkStrategy + SparkPlan" tier — the whole-operator
 * form of J1): `KnnJoin` is a logical binary node (queries × documents),
 * [[KnnJoinStrategy]] plans it to [[KnnJoinExec]], and the physical
 * operator runs the broadcast-queries / per-partition-bounded-heap kernel
 * directly over InternalRows.
 *
 * Why a physical operator instead of the DataFrame composition: the
 * logical node keeps the *intent* ("top-k per query") visible to the
 * planner — children are `planLater`'d so Catalyst still optimizes both
 * inputs (pushdown, pruning), and alternative physical strategies (an
 * IVF-backed rewrite, a GPU kernel) can be added per plan shape without
 * touching user code.
 *
 * Registered through `graft.GraftExtensions` (injectPlannerStrategy), or
 * per-session via `KnnJoinPlan.install(spark)`.
 */
case class KnnJoin(
    queries: LogicalPlan,
    docs: LogicalPlan,
    k: Int,
    metric: KnnSearch.Metric,
    excludeSelf: Boolean,
    // output attributes live in the constructor so `copy()` during
    // optimizer rewrites preserves exprIds — re-minting them would orphan
    // every parent reference
    output: Seq[Attribute] = KnnJoin.mintOutput()) extends BinaryNode {

  override def left: LogicalPlan = queries
  override def right: LogicalPlan = docs

  // the operator mints its output attributes (they are not drawn from the
  // children), like a leaf/generator node
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  // the kernel reads BOTH child columns positionally (id, vector): declare
  // them as references or ColumnPruning will slot an empty Project under
  // the node and the exec's positional reads walk off the row
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(queries.output ++ docs.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(queries = newLeft, docs = newRight)
}

object KnnJoin {
  def mintOutput(): Seq[Attribute] = Seq(
    AttributeReference("query_id", LongType, nullable = false)(),
    AttributeReference("doc_id", LongType, nullable = false)(),
    AttributeReference("score", DoubleType, nullable = false)(),
    AttributeReference("rank", IntegerType, nullable = false)())
}

case class KnnJoinExec(
    queriesPlan: SparkPlan,
    docsPlan: SparkPlan,
    k: Int,
    metric: KnnSearch.Metric,
    excludeSelf: Boolean,
    output: Seq[Attribute]) extends BinaryExecNode {

  override def left: SparkPlan = queriesPlan
  override def right: SparkPlan = docsPlan

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(queriesPlan = newLeft, docsPlan = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // The query side is the broadcast side by contract (reference
    // workloads: O(100) queries vs the corpus): collect + broadcast.
    val queryRows = queriesPlan.executeCollect()
    // skip malformed query rows (null id or null vector), mirroring the
    // docs-side isNullAt guard in the scan loop
    val queries: Array[(Long, Array[Double])] = queryRows.iterator
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map { r =>
        val arr = r.getArray(1)
        val v = new Array[Double](arr.numElements())
        var i = 0
        while (i < v.length) { v(i) = arr.getFloat(i).toDouble; i += 1 }
        (r.getLong(0), v)
      }.toArray
    val bc = sparkContext.broadcast(queries)
    val desc = metric.descending
    val kk = k
    val exSelf = excludeSelf
    val m = metric

    // one pass over the documents: per-partition bounded heaps
    val candidates = docsPlan.execute().mapPartitions { it =>
      val qs = bc.value
      val heaps = qs.map { _ =>
        val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
          def compare(a: (Double, Long), b: (Double, Long)): Int = {
            val c = if (desc) java.lang.Double.compare(a._1, b._1)
                    else java.lang.Double.compare(b._1, a._1)
            if (c != 0) c else java.lang.Long.compare(b._2, a._2)
          }
        }
        collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst.reverse)
      }
      var widened = new Array[Double](0)
      it.foreach { row =>
        if (!row.isNullAt(1)) {
          val docId = row.getLong(0)
          val arr = row.getArray(1)
          val n = arr.numElements()
          if (widened.length != n) widened = new Array[Double](n)
          var i = 0
          while (i < n) { widened(i) = arr.getFloat(i).toDouble; i += 1 }
          var qi = 0
          while (qi < qs.length) {
            if (!(exSelf && qs(qi)._1 == docId)) {
              val s = m.score(qs(qi)._2, widened)
              val h = heaps(qi)
              if (h.size < kk) h.enqueue((s, docId))
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
      // one best-first-sorted array per query per partition
      heaps.iterator.zipWithIndex.map { case (h, qi) =>
        (qs(qi)._1, h.dequeueAll.reverse.toArray)
      }
    }

    // Distributed global reduce: reduceByKey on query_id with the sorted
    // two-way merge as a map-side combiner. The result never touches the
    // driver — each output partition materializes its queries' rank rows
    // directly, so the operator holds at 10⁶ input splits where a
    // collect-based merge would funnel partitions×|Q|×k rows through the
    // driver.
    // Only |Q| distinct keys exist, so cap the reduce-side partition count
    // there rather than inheriting the doc side's split count.
    val out = output
    val reduceParts = math.max(1, math.min(queries.length, candidates.getNumPartitions))
    candidates.reduceByKey(KnnSearch.mergeTopK(desc, kk)(_, _), reduceParts)
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(out.map(_.dataType).toArray)
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
        it.flatMap { case (qid, arr) =>
          arr.iterator.zipWithIndex.map { case ((s, d), i) =>
            row.update(0, qid); row.update(1, d); row.update(2, s); row.update(3, i + 1)
            proj(row)
          }
        }
      }
  }
}

object KnnJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KnnJoin(queries, docs, k, metric, exSelf, output) =>
      KnnJoinExec(planLater(queries), planLater(docs), k, metric, exSelf,
        output) :: Nil
    case _ => Nil
  }
}

object KnnJoinPlan {

  /** Register the strategy on an existing session (idempotent — the guard
    * must read the same list it appends to: experimental.extraStrategies,
    * not the extension-injected planner strategies). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(KnnJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ KnnJoinStrategy
    }

  /** Dataset API over the custom operator: top-k docs per query. Children
    * are ordinary DataFrames — Catalyst optimizes them independently
    * (pushdown/pruning) before the strategy plans the join itself. */
  def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
              docs: DataFrame, dIdCol: String, dVecCol: String,
              k: Int, metric: KnnSearch.Metric = KnnSearch.Cosine,
              excludeSelf: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    install(spark)
    val q = queries.select(col(qIdCol).cast("long"), col(qVecCol).cast("array<float>"))
    val d = docs.select(col(dIdCol).cast("long"), col(dVecCol).cast("array<float>"))
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark,
      KnnJoin(q.queryExecution.analyzed, d.queryExecution.analyzed, k, metric, excludeSelf))
  }
}
