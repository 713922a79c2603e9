package graft.streaming

import org.apache.spark.sql.SparkSession

/**
 * Loud-refusal lease for OUT-OF-BAND archive maintenance — takedowns
 * ([[ArchiveDedup.forgetDocs]], `CorpusStats.retractFrom*StatsArchive`)
 * and out-of-band compaction/reseeds. "One maintainer per archive
 * directory" was a documented convention through round 13; two
 * concurrent maintainers interleaving their state reads and commits
 * was the one remaining SILENT-corruption shape (each individual
 * commit is temp+rename-atomic and refuses an existing target, but two
 * maintainers can base their rewrites on the same snapshot and the
 * second commit then encodes a state that never existed). This makes
 * the convention mechanical: every out-of-band maintenance operation
 * runs under `withLease`, and a second maintainer REFUSES with the
 * first's identity instead of corrupting.
 *
 * Scope — deliberately NOT the streaming sinks: a sink's in-loop work
 * (batch commits, tiered compaction, auto-reseed) is serialized by
 * Structured Streaming itself (one foreachBatch at a time per query),
 * and its races against a concurrent takedown are already handled
 * loudly by the commit machinery (a fold racing a reseed-shaped commit
 * aborts it; an existing entry refuses) — the forget-under-load
 * contract depends on the stream NOT stopping for maintenance, so the
 * sinks never touch the lease.
 *
 * Mechanics: `fs.create(path, overwrite = false)` on a dot-prefixed
 * file inside the archive dir — atomic create-if-absent on HDFS-like
 * stores, a loud existence check on local filesystems (the goal is
 * refusing ACCIDENTAL concurrency with a named culprit, not a
 * distributed lock service; an adversarial same-millisecond race on a
 * raw local FS is out of scope and still ends in one maintainer's
 * commit refusing on the existing-entry checks). The lease names its
 * holder (operation, timestamp, JVM) so the refusal is actionable.
 * Released in `finally` — an operation that fails its own guards
 * (un-archived ids, foreign family) does not wedge the directory.
 *
 * Stale-lease recovery: a maintainer that CRASHES mid-operation leaves
 * its lease behind, and every later maintenance call refuses loudly,
 * naming the dead holder. That is the intended failure mode — silent
 * expiry (TTLs) would re-admit a maintainer while a slow-but-alive one
 * still runs. Recovery is explicit: verify the named holder is dead
 * (the JVM name carries pid@host), then [[breakLease]] and retry. A
 * crashed maintainer's partial work is harmless by the commit
 * protocol (temp dirs invisible, renames atomic), so break-and-retry
 * is always safe.
 */
object MaintenanceLease {
  private def hfs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def leasePath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/.maintenance-lease")

  /** Run `body` holding `dir`'s maintenance lease; refuse loudly
    * (naming the current holder) if another maintainer holds it. */
  def withLease[T](spark: SparkSession, dir: String, op: String)(body: => T): T = {
    val (fs, _) = hfs(spark, dir)
    val p = leasePath(dir)
    val holder = s"$op at ${java.time.Instant.now()} by JVM " +
      java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    val out =
      try fs.create(p, false)
      catch {
        case e: java.io.IOException =>
          val existing =
            try {
              val in = fs.open(p)
              try new String(in.readAllBytes(), "UTF-8") finally in.close()
            } catch { case _: Throwable => "<lease unreadable>" }
          throw new IllegalStateException(
            s"$op: archive $dir is under maintenance by another " +
              s"maintainer ($existing) — one maintainer per archive " +
              "directory. If that maintainer CRASHED (stale lease), " +
              "verify its JVM is dead, then " +
              "MaintenanceLease.breakLease(spark, dir) and retry; a " +
              "crashed maintainer's partial work is invisible by the " +
              "temp+rename commit protocol, so break-and-retry is safe.",
            e)
      }
    // a failed holder write must not leak an anonymous lease: delete
    // the just-created file before rethrowing (a JVM death BETWEEN
    // create and write still leaks — that is a genuine crash, and the
    // stale-lease recovery path below is exactly for it)
    try { try out.write(holder.getBytes("UTF-8")) finally out.close() }
    catch { case t: Throwable => fs.delete(p, false); throw t }
    // an InjectedCrash IS a process death for on-disk purposes: the
    // crash seam's contract is bit-identical state to a kill at that
    // instant, and a killed maintainer leaves its lease behind. Running
    // the finally delete for it would hand the recovery specs a
    // conveniently pre-cleaned directory the real failure never
    // produces — so the lease stays, and recovery must verify the
    // holder is dead and breakLease, exactly as the class doc says.
    var simulatedKill = false
    try body
    catch { case c: CrashPoints.InjectedCrash => simulatedKill = true; throw c }
    finally if (!simulatedKill) fs.delete(p, false)
  }

  /** Stale-lease recovery after a maintainer crash — see class doc.
    * Returns true iff a lease file existed and was removed. */
  def breakLease(spark: SparkSession, dir: String): Boolean = {
    val (fs, _) = hfs(spark, dir)
    fs.delete(leasePath(dir), false)
  }

  /** The current holder's self-description, if a lease is held —
    * for diagnostics and specs. */
  def holder(spark: SparkSession, dir: String): Option[String] = {
    val (fs, _) = hfs(spark, dir)
    val p = leasePath(dir)
    if (!fs.exists(p)) None
    else
      Some(try {
        val in = fs.open(p)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      } catch { case _: Throwable => "<lease unreadable>" })
  }
}
