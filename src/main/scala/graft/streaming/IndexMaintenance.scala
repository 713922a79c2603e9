package graft.streaming

import graft.operators.ServingIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming maintenance of a resident serving index — the reference's
 * incremental single/batch insert and delete endpoints
 * (day_8/endpoints.py:13-49,168-208 insert, :210-260 delete) consumed as
 * a stream: each micro-batch is applied against the LSM-shaped
 * [[ServingIndex.Mutable]] as upserts (vector present) and deletes (null
 * vector = tombstone row), so streamed vectors are searchable at the next
 * batch boundary.
 *
 * The micro-batch lands on the driver: the WRITER side of a serving index
 * is driver-held state by design (see [[ServingIndex.Mutable]]'s scale
 * note) — mutation batches are serving-sized, the bulk corpus stays
 * distributed, and the compaction thresholds bound resident mutation
 * state no matter how long the stream runs. Per-id ordering WITHIN one
 * micro-batch follows row order, which Spark does not define across
 * partitions — streams carrying multiple versions of an id per batch
 * should pre-compact (e.g. the latest-wins pattern of
 * [[EventStream.upsertSink]]) before this sink.
 */
object IndexMaintenance {

  /** Default per-batch row budget: mutation batches at serving rates are
    * thousands of rows; a million-row batch means a backfill replaying
    * history into the driver-resident writer, which must be REFUSED (and
    * bulk-loaded through the distributed builders instead), in the same
    * spirit as [[graft.operators.LocalServing]]'s byte budget. */
  val DefaultMaxBatchRows: Long = 1000000L

  /** Apply one batch of (id, vec) rows: null vec ⇒ delete, else upsert.
    * Refuses batches over `maxBatchRows` — the micro-batch lands on the
    * driver, so an unbounded batch (a backfill replay, a misrouted bulk
    * load) would otherwise OOM the writer. The guard and the fetch are
    * ONE evaluation: collecting `limit(budget+1)` both bounds driver
    * memory and detects the overflow (a separate count() evaluated the
    * whole batch plan twice per micro-batch — and had to scan ALL of a
    * runaway batch just to refuse it, where the limit short-circuits). */
  def applyBatch(batch: DataFrame, idx: ServingIndex.Mutable,
                 idCol: String, vecCol: String,
                 maxBatchRows: Long = DefaultMaxBatchRows): Unit = {
    import org.apache.spark.sql.functions.col
    // cast the vector side too: array<double> sources (JSON/CSV-parsed or
    // Double-computed vectors) must not ClassCastException at getSeq[Float];
    // nulls survive the cast, so delete rows are unaffected
    val rows = batch.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
    val cap = math.min(maxBatchRows, (Int.MaxValue - 1).toLong).toInt
    val collected = rows.limit(cap + 1).collect()
    require(collected.length <= cap,
      s"micro-batch exceeds the maintenance budget $maxBatchRows — " +
        "bulk-load through the distributed index builders instead")
    collected.foreach { r =>
      val id = r.getLong(0)
      if (r.isNullAt(1)) idx.delete(id)
      else idx.upsert(id, r.getSeq[Float](1).toArray)
    }
  }

  /** Attach a mutable index to a streaming (id, vec) frame. */
  def maintain(updates: DataFrame, idx: ServingIndex.Mutable,
               idCol: String = "id", vecCol: String = "vec",
               maxBatchRows: Long = DefaultMaxBatchRows): StreamingQuery =
    updates.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, idx, idCol, vecCol, maxBatchRows)
      }
      .start()
}
