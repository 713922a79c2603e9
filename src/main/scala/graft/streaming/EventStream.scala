package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/**
 * Structured Streaming ingest over the events table (SURVEY §2.10: the
 * reference's incremental insert endpoints are the natural streaming seam).
 * Watermarked event-time tumbling windows; the same aggregation shape as
 * the batch q06_hourly_events so streaming results are batch-verifiable.
 *
 * events.ts has shipped as INT64 nanos (read as LongType via nanosAsLong)
 * and as timestamp[us] (TIMESTAMP_NTZ); [[readEvents]] probes the files'
 * actual layout and normalizes to the canonical [[eventSchema]] shape —
 * `ts` as BIGINT epoch nanos plus a derived `event_time` timestamp.
 */
object EventStream {

  /** Canonical post-normalization schema (ts = BIGINT epoch nanos). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // epoch nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Harness-wide event-time contract: every session is pinned to UTC
    * at BUILD time (Verify / Bench / Graft all set
    * `spark.sql.session.timeZone` on their builders), so within this
    * harness event queries are order-independent. This idempotent
    * repair exists for FOREIGN sessions (e.g. a driver smoke-check
    * that builds its own session): the NTZ→timestamp cast in the
    * layout normalizers must not depend on the launcher's local zone.
    * It is deliberately the ONLY place the library touches session
    * conf — callers embedding the library in a zone-sensitive app
    * should pin the zone on their own builder. Also enables the
    * legacy nanos-as-long read path (ts layout #1). */
  private[graft] def pinEventSession(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** Streaming source over a parquet directory of event files. A one-off
    * batch footer read decides which ts layout the directory carries (a
    * streaming source needs its schema up front); both layouts come out
    * as the canonical nanos-long `ts` + `event_time` timestamp. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    pinEventSession(spark)
    val tsType = spark.read.parquet(dir).schema("ts").dataType
    val fileSchema = StructType(eventSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    val raw = spark.readStream
      .schema(fileSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    tsType match {
      case LongType =>
        raw.withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        raw.withColumn("event_time", col("ts").cast(TimestampType))
          .withColumn("ts", unix_micros(col("event_time")) * lit(1000L))
    }
  }

  /** Batch twin of [[readEvents]]'s layout normalization: read an events
    * parquet path and come out with `ts` as BIGINT epoch nanos whichever
    * physical layout the files carry. */
  def normalizedBatch(spark: SparkSession, path: String): DataFrame = {
    pinEventSession(spark)
    val df = spark.read.parquet(path)
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }

  /** Watermarked tumbling-window counts per event type. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

  /** Run to completion against a memory sink (local verification harness —
    * processAllAvailable drives the finite file source synchronously). */
  def runToMemory(agg: DataFrame, name: String): StreamingQuery = {
    val q = agg.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable()
    q
  }

  /** Finished user session (stateful sessionization output). */
  case class UserSession(user_id: Long, n_events: Long, total_value: Double,
                         start_ns: Long, end_ns: Long)

  /** Running per-user session state (public: encoder codegen must reach
    * the accessors from generated classes). */
  case class SessionState(n: Long, value: Double, startNs: Long, lastNs: Long)

  /**
   * Stateful sessionization with `flatMapGroupsWithState` (SURVEY §2.10's
   * custom-state tier): per-user running session, closed and emitted when
   * a later event arrives past the `gapNs` event-time gap (within or
   * across micro-batches). Input rows (user_id, ts_ns, value) are sorted
   * per group before folding — deterministic at any parallelism.
   *
   * Tail flush: the input is watermarked (`watermarkDelay` behind max
   * event time) and every open session arms an EventTimeTimeout at
   * `last + gap`; when the watermark passes it, the group fires with no
   * rows and the tail session is emitted and the state dropped — so a
   * user who simply stops producing events still gets their last session,
   * without waiting for another event from them. Event-time, not
   * processing-time, timeouts: wall-clock timeouts make the local engine
   * spin empty micro-batches and tie emission to scheduling luck.
   *
   * Lateness: Spark's stateful late-row filter drops input rows older
   * than the watermark BEFORE they reach the state function, so the
   * watermark delay is the cross-batch disorder tolerance. The default
   * is one full session gap — an event arriving later than that would
   * target a session the timeout may already have flushed. Pass a larger
   * `watermarkDelay` for streams with deeper disorder (trades state
   * retention and flush latency for tolerance); `"0 seconds"` drops any
   * event that arrives out-of-order across micro-batches.
   */
  def sessionizeStateful(events: org.apache.spark.sql.Dataset[(Long, Long, Double)],
                         gapNs: Long = 1800L * 1000000000L,
                         watermarkDelay: String = null)
      : org.apache.spark.sql.Dataset[UserSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapNs / 1000000L
    val delay = if (watermarkDelay == null) s"$gapMs milliseconds" else watermarkDelay
    events
      .toDF("user_id", "ts_ns", "value")
      .withColumn("event_time", timestamp_micros(expr("ts_ns DIV 1000")))
      .withWatermark("event_time", delay)
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Double, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new rows: flush the tail
            val tail = state.getOption.map(s =>
              UserSession(userId, s.n, s.value, s.startNs, s.lastNs))
            state.remove()
            tail.iterator
          } else {
            val sorted = rows.toArray.sortBy(_._2)
            val out = collection.mutable.ArrayBuffer.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { case (_, ts, v, _) =>
              cur match {
                case Some(s) if ts - s.lastNs > gapNs =>
                  out += UserSession(userId, s.n, s.value, s.startNs, s.lastNs)
                  cur = Some(SessionState(1, v, ts, ts))
                case Some(s) =>
                  // an out-of-order row from a later micro-batch (still
                  // inside the watermark delay) may carry ts < lastNs:
                  // widen the session bounds, never regress them — an
                  // overwrite would pull the re-armed timeout backwards
                  // and could split the session on the next in-order row
                  cur = Some(SessionState(s.n + 1, s.value + v,
                    math.min(s.startNs, ts), math.max(s.lastNs, ts)))
                case None =>
                  cur = Some(SessionState(1, v, ts, ts))
              }
            }
            cur.foreach { s =>
              val closeAtMs = s.lastNs / 1000000L + gapMs
              if (closeAtMs <= state.getCurrentWatermarkMs()) {
                // the watermark already passed this session's close point
                // (possible with late data): emit immediately — arming a
                // timeout in the past is rejected by the state store
                out += UserSession(userId, s.n, s.value, s.startNs, s.lastNs)
                state.remove()
              } else {
                state.update(s)
                state.setTimeoutTimestamp(closeAtMs)
              }
            }
            out.iterator
          }
      }
  }

  /**
   * Streaming exact dedup — the batch `Dedup.dropExactDuplicates`
   * operator over an unbounded document stream: keep the FIRST arrival
   * of each canonical fingerprint ([[graft.functions.TextFunctions.fingerprint]]:
   * md5 of lowercased, whitespace-collapsed text), drop later copies.
   *
   * State is bounded by the watermark: `dropDuplicatesWithinWatermark`
   * evicts a fingerprint once the event-time watermark passes its FIRST
   * sighting + the delay (duplicates do NOT extend the expiry —
   * SPARK-42931's defined semantics), so a 100 TB/day stream holds only
   * the horizon's fingerprints (16 bytes each) in the state store — the
   * streaming twin of the hash-groupBy dedup's shuffle key. A copy
   * arriving after that expiry is re-emitted, even if other copies kept
   * arriving meanwhile (the contract is dedup WITHIN the horizon of the
   * first sighting; cross-horizon dedup is the batch job's business).
   */
  def dedupStream(docs: DataFrame, textCol: String, timeCol: String,
                  watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("__fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming quality gate — [[graft.operators.QualityFilters]]'s
    * Gopher/C4 battery applied at INGEST time, before documents ever
    * land in the collection. The battery is pure stateless column
    * expressions, so it runs on an unbounded stream unchanged (no
    * watermark, no state store) and is batch-identical by construction:
    * the verdict for a document depends on that document alone. Chains
    * ahead of [[dedupStream]] in a streaming curation pipeline — reject
    * cheap-to-test garbage before paying dedup state for it. */
  def qualityFilterStream(docs: DataFrame, textCol: String): DataFrame =
    docs.where(graft.operators.QualityFilters.keepPredicate(col(textCol)))

  /** Streaming scrub gate — PII redaction + phrase blocklist applied at
    * INGEST, ahead of [[qualityFilterStream]] and [[dedupStream]] in a
    * streaming curation pipeline. Both stages are stateless column
    * expressions ([[graft.operators.QualityFilters.redactPii]] /
    * `blocklistHit`), so they run on an unbounded stream unchanged (no
    * watermark, no state store) and are batch-identical by construction. */
  def scrubStream(docs: DataFrame, textCol: String,
                  blockPhrases: Seq[String]): DataFrame =
    docs
      .where(!graft.operators.QualityFilters.blocklistHit(col(textCol), blockPhrases))
      .withColumn(textCol, graft.operators.QualityFilters.redactPii(col(textCol)))

  /** Per-(band,bucket) LSH claim: the first doc to hash into the bucket
    * within the horizon owns it (public: encoder codegen). */
  case class BandClaim(claimant: Long, claimMs: Long)

  /** One doc × band verdict: `dup` ⇔ the bucket was already claimed by a
    * DIFFERENT doc inside the horizon. */
  case class BandVerdict(doc_id: Long, band: Int, dup: Boolean)

  /** Exploded doc × band row (public: encoder codegen must reach the
    * accessors from generated classes). The event time lives only in
    * `event_time` (the watermark column); millis are derived at use. */
  case class BandRow(doc_id: Long, band: Int, bucket: String,
                     event_time: java.sql.Timestamp)

  /**
   * Streaming MinHash near-dup filter — the batch
   * [[graft.operators.Dedup.minhashLshPairs]] candidate generator over an
   * unbounded document stream. Each doc is shingled and banded with the
   * SAME md5 minhash banding as the batch operator
   * (`Dedup.bandBucketsOf`), then each (band, bucket) key runs a stateful
   * first-arrival claim: the first doc (by event time, ties by id) inside
   * the horizon owns the bucket; later docs hashing into it are flagged
   * `dup` for that band. A doc is a near-duplicate iff ANY of its bands
   * is flagged — collapse with [[keptOf]] inside `foreachBatch` (the
   * per-doc reduction is batch-local because a doc's `bands` rows always
   * travel in one micro-batch; keeping it out of the streaming plan also
   * avoids chaining a second stateful operator after
   * `flatMapGroupsWithState`, which Spark does not support).
   *
   * Like the exact [[dedupStream]], state is horizon-bounded: a claim
   * expires when the watermark passes its FIRST sighting + the horizon
   * (an EventTimeTimeout armed once at claim — duplicates do not extend
   * it), so an unbounded stream holds only the horizon's buckets
   * (bands × 32-byte hashes per doc). This is candidate-level dedup: a
   * NEW doc that collides in a band is dropped without exact-Jaccard
   * verification — the streaming trade (no doc store to verify against);
   * tune bands/rows for the candidate precision the pipeline needs, and
   * leave cross-horizon dedup to the batch job.
   */
  def nearDupBandVerdicts(docs: DataFrame, idCol: String, textCol: String,
                          timeCol: String, numHashes: Int = 16, bands: Int = 4,
                          shingleLen: Int = 3, horizonMs: Long = 3600000L)
      : org.apache.spark.sql.Dataset[BandVerdict] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = docs.sparkSession
    import spark.implicits._
    val nh = numHashes
    val nb = bands
    val sl = shingleLen
    val horizon = horizonMs
    docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"),
        col(timeCol).cast("timestamp").as("event_time"))
      .as[(Long, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text, t) =>
          val buckets = graft.operators.Dedup.bandBucketsOf(
            md, graft.operators.Dedup.shinglesOf(text, sl), nh, nb)
          (0 until nb).iterator.map(b => BandRow(id, b, buckets(b), t))
        }
      }
      .withWatermark("event_time", s"$horizon milliseconds")
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[BandClaim, BandVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, String), rows: Iterator[BandRow], state: GroupState[BandClaim]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic first-arrival order at any parallelism
            val sorted = rows.toArray.sortBy(r => (r.event_time.getTime, r.doc_id))
            var claim = state.getOption
            val newClaim = claim.isEmpty
            val out = sorted.map { r =>
              claim match {
                case Some(c) => BandVerdict(r.doc_id, key._1, dup = r.doc_id != c.claimant)
                case None =>
                  claim = Some(BandClaim(r.doc_id, r.event_time.getTime))
                  BandVerdict(r.doc_id, key._1, dup = false)
              }
            }
            if (newClaim) claim.foreach { c =>
              // first-sighting + horizon expiry, armed once (duplicates do
              // not extend it — dropDuplicatesWithinWatermark's contract);
              // a claim already past the watermark is not stored at all
              // (the state store rejects timeouts in the past)
              if (c.claimMs + horizon > state.getCurrentWatermarkMs()) {
                state.update(c)
                state.setTimeoutTimestamp(c.claimMs + horizon)
              }
            }
            out.iterator
          }
      }
  }

  /** Batch-local collapse of [[nearDupBandVerdicts]] output: docs none of
    * whose bands were claimed by another doc. Use inside `foreachBatch`. */
  def keptOf(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("doc_id"))
      .agg(max(when(col("dup"), lit(1)).otherwise(lit(0))).as("__any_dup"))
      .where(col("__any_dup") === 0)
      .select(col("doc_id"))

  /** Streaming upsert sink into a collection (foreachBatch latest-wins
    * merge — the reference's batch-insert endpoint as a stream consumer). */
  def upsertSink(updates: DataFrame, root: String, collection: String,
                 idCol: String, versionCol: String): StreamingQuery =
    updates.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val target = graft.sources.CollectionStore.path(root, collection)
        val merged =
          if (new java.io.File(target).exists())
            graft.sources.CollectionStore.upsert(
              spark.read.parquet(target), batch, idCol, versionCol)
          else batch
        merged.cache().count() // materialize before overwrite of the source
        merged.write.mode("overwrite").parquet(target + "_tmp")
        merged.unpersist()
        // crash-safe swap: move the live dir aside, promote tmp, then drop
        // the old data — a failure at any step leaves a recoverable dir,
        // and a failed rename aborts the batch instead of losing the table
        val tmp = new java.io.File(target + "_tmp")
        val dst = new java.io.File(target)
        val old = new java.io.File(target + "_old")
        org.apache.commons.io.FileUtils.deleteQuietly(old)
        if (dst.exists() && !dst.renameTo(old))
          throw new java.io.IOException(s"could not move $dst aside")
        if (!tmp.renameTo(dst)) {
          old.renameTo(dst) // restore
          throw new java.io.IOException(s"could not promote $tmp to $dst")
        }
        org.apache.commons.io.FileUtils.deleteQuietly(old)
        ()
      }
      .start()
}
