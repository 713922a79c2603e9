package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Session-scoped reuse of expensive pipeline-stage intermediates — the
 * fuzzy-dedup family's shared pair frames in particular.
 *
 * The pair-emission stages (MinHash-LSH over shingles, hyperplane-LSH
 * over embeddings) are the dominant cost of the dedup family, and the
 * natural pipeline REUSES one pair set across several consumers: pair
 * listing (q15/q35), duplicate-cluster formation (q75), and the
 * keep-one transform (q77) all start from the identical pair frame. The
 * reference's own staged pipeline caches the expensive stage the same
 * way (ref: day_10/embedders/embedding_pipeline.py:238-314 memoizes the
 * embedding stage for downstream consumers). Without reuse, a
 * pairs→components→transform pipeline pays banding + bucket
 * verification three times; at 100 TB that triples the job's dominant
 * stage.
 *
 * Mechanics: `cached(stage, input)(build)` keys on
 * (session, stage-descriptor, CANONICALIZED logical plan of the input,
 * FILE-LISTING SNAPSHOT of the input), so two calls reuse a frame only
 * when they read the same source with the same operator parameters (the
 * descriptor must encode every parameter that shapes the output) AND
 * the same physical files. The file listing is the data-snapshot
 * component the canonicalized plan lacks — a plan identifies a source
 * by path and schema, but Spark writes overwrites/upserts under fresh
 * part-file names, so an overwritten corpus (CollectionStore.upsert
 * rewrites exactly this way) changes the listing and misses the cache
 * instead of silently serving yesterday's frame (StageCacheSpec gates
 * build → overwrite → re-derive). Residual contract: a source mutated
 * IN PLACE under identical file names (same paths, same count — not
 * how Spark or CollectionStore ever write) is indistinguishable and
 * would still serve the cached frame. The built frame is persisted
 * (MEMORY_AND_DISK_SER) and materialized once, with the build wall time
 * recorded — [[graft.SparkEntry.artifactBuildSeconds]] republishes it
 * so benchmarks amortize reuse without hiding construction cost (the
 * same protocol as the memoized q33/q41/q42 index builds).
 *
 * Resource bounds: an LRU cap of [[MaxEntries]] frames; eviction and
 * [[clear]] unpersist the backing blocks eagerly. Entries from a
 * stopped SparkContext are dropped on access. Disable per session with
 * `spark.graft.stageCache.enabled=false` (every consumer then
 * recomputes; results are identical by construction — the cache stores
 * exactly what `build` returns).
 */
object StageCache {
  /** Max frames retained; eldest is unpersisted and dropped beyond it. */
  val MaxEntries = 8

  private final case class Entry(df: DataFrame, buildSec: Double)

  // access-ordered LinkedHashMap → true LRU; all access synchronized
  // (stage builds are driver-side and rare — contention is not a concern)
  private val cache =
    new java.util.LinkedHashMap[(org.apache.spark.sql.SparkSession, String, Any), Entry](
      16, 0.75f, true)
  private val buildWall = scala.collection.concurrent.TrieMap.empty[String, Double]
  // per-stage reuse telemetry: (hits, misses) since JVM start — published
  // by Bench into BENCH_DETAIL.json so a sweep's reuse behavior is
  // auditable (a claimed frame reuse shows up as a hit, not an assertion)
  private val hitCount = scala.collection.concurrent.TrieMap.empty[String, Long]
  private val missCount = scala.collection.concurrent.TrieMap.empty[String, Long]

  def enabled(s: org.apache.spark.sql.SparkSession): Boolean =
    s.conf.getOption("spark.graft.stageCache.enabled")
      .forall(v => scala.util.Try(v.trim.toBoolean).getOrElse(true))

  /** Drop every entry whose SparkContext is stopped (unpersist is a
    * no-op on a dead context, so removal suffices) — called
    * opportunistically so dead sessions' frames don't pin references
    * until their exact key happens to be re-requested. Caller must
    * hold the cache lock. */
  private def sweepStopped(): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val alive =
        try !it.next().getValue.df.sparkSession.sparkContext.isStopped
        catch { case _: Throwable => false }
      if (!alive) it.remove()
    }
  }

  /** Build-or-reuse `stage` over `input`. `stage` MUST encode every
    * parameter that changes the output (threshold, widths, columns…) —
    * the input DATA identity is covered by the canonicalized plan plus
    * the file-listing snapshot in the key (see object doc for the
    * staleness contract). */
  def cached(stage: String, input: DataFrame)(build: => DataFrame): DataFrame = {
    val s = input.sparkSession
    if (!enabled(s)) return build
    // the listing is the snapshot component: an overwrite/upsert writes
    // new part-file names, so it invalidates here. Non-file inputs
    // (in-memory, RDD-backed) list empty and fall back to plan identity.
    val files =
      try input.inputFiles.toList.sorted
      catch { case _: Throwable => Nil }
    val key = (s, stage, (input.queryExecution.logical.canonicalized, files))
    cache.synchronized {
      sweepStopped()
      val hit = cache.get(key)
      if (hit != null) {
        hitCount.updateWith(stage)(c => Some(c.getOrElse(0L) + 1L))
        return hit.df
      }
      missCount.updateWith(stage)(c => Some(c.getOrElse(0L) + 1L))
    }
    // build OUTSIDE the lock (materialization runs Spark jobs); a rare
    // concurrent duplicate build is benign — last one wins, loser's
    // blocks are unpersisted
    val t0 = System.nanoTime()
    val df = build.persist(StorageLevel.MEMORY_AND_DISK_SER)
    df.count() // materialize now so the build wall is attributable
    val sec = (System.nanoTime() - t0) / 1e9
    buildWall.put(s"x_stage_${stage}_build", sec)
    cache.synchronized {
      val prev = cache.put(key, Entry(df, sec))
      if (prev != null) prev.df.unpersist(false)
      if (cache.size > MaxEntries) {
        val it = cache.entrySet().iterator()
        if (it.hasNext) { it.next().getValue.df.unpersist(false); it.remove() }
      }
    }
    df
  }

  /** Wall seconds of each stage build this session (bench-published). */
  def buildSeconds: Map[String, Double] = buildWall.toMap

  /** (hits, misses) per stage since JVM start — bench-published so a
    * cold sweep's reuse pattern is auditable rather than asserted. A
    * disabled cache records nothing (every consumer rebuilds). */
  def hitMissCounts: Map[String, (Long, Long)] =
    (hitCount.keySet ++ missCount.keySet).map(k =>
      k -> (hitCount.getOrElse(k, 0L), missCount.getOrElse(k, 0L))).toMap

  /** Unpersist and drop everything (tests / session teardown). */
  def clear(): Unit = cache.synchronized {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      try if (!e.getValue.df.sparkSession.sparkContext.isStopped)
        e.getValue.df.unpersist(false)
      catch { case _: Throwable => () }
      it.remove()
    }
  }
}
