package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query against
 * SPARK_GRAFT_SF_DIR and prints one JSON line
 * {"metric":...,"value":total_sec,"queries":{name:sec,...},"sf":...}.
 *
 * Each query runs cold once (discarded — one-off JVM/codegen/file-listing
 * costs a long-running engine amortizes away), then three warm runs with
 * the MEDIAN reported: a single warm measurement published one GC pause
 * or scheduler hiccup as signal (the round-6 run showed an 11.9 s "time"
 * for a query whose driver-run history is 0.4 s — pure measurement
 * noise), while the median of three is robust to one bad run and still
 * cheap. Heavy queries whose warm runs overlapped a JIT compile storm
 * take up to 2 extra settle samples and report the median of the LAST 3
 * (see the settle note in `measure`). The day_6 serving keys keep their
 * tighter warm-twice/min-of-9 scheme (sub-ms latencies need the sharper
 * estimator).
 *
 * Round 16 additions (see the inline notes): drift-aware publishing —
 * a query whose last-3 spread blows past the sweep's variance band
 * while the calibration bracket confirms in-record machine drift
 * publishes its least-spread window's median and is listed under
 * "drifted" (raw value preserved) — and an "ab" block recording whether
 * this record's calibration moved >10% vs the previous round's
 * published record (the tools/bench_ab.py adjudication trigger).
 */
object Bench {

  /** Relative spread of a 3-sample window: (max − min) / median. */
  private[graft] def relSpread(w: Array[Double]): Double = {
    val s = w.sorted
    if (s(1) > 0) (s(2) - s(0)) / s(1) else 0.0
  }

  /** The sweep's own out-of-band threshold: 3× the p90 of every query's
    * settled-window (last-3) relative spread, floored at 0.25.
    *
    * p90 is the NEAREST-RANK percentile (ceil(0.9·n)-th smallest): the
    * earlier floor-index form `(n*9)/10` selected the MAXIMUM spread for
    * any sweep of ≤10 queries, letting one blown window inflate the band
    * and suppress its own annotation (r16 ADVICE). Known remaining bias,
    * documented rather than modeled: windows already past the floor
    * participate in the distribution, so a sweep where MANY queries drift
    * raises the band conservatively — annotation under-fires, published
    * values stay raw-auditable, never silently rewritten. */
  private[graft] def driftBand(allSamples: Seq[Array[Double]]): Double = {
    val spreads = allSamples.filter(_.length >= 3)
      .map(s => relSpread(s.takeRight(3))).toArray.sorted
    val p90 =
      if (spreads.isEmpty) 0.0
      else spreads(math.min(spreads.length - 1,
        math.max(0, math.ceil(spreads.length * 0.9).toInt - 1)))
    math.max(0.25, 3.0 * p90)
  }

  /** Median of the LEAST-spread contiguous 3-sample window — the settled
    * value a drift-annotated query publishes (needs ≥3 samples). */
  private[graft] def leastSpreadMedian(samples: Array[Double]): Double = {
    val s = samples.sliding(3).minBy(relSpread).sorted
    s(1)
  }

  /** Round-17 re-sampling rule (r16 verdict ask #3): a 3-sample query
    * whose spread blows the band under confirmed in-record drift has no
    * alternative window — instead of annotating its raw (possibly 3–4×
    * drift-inflated) median, the sweep takes up to 3 extra post-sweep
    * samples (stopping as soon as the trailing 3-window settles) and
    * publishes [[settledWindow]]'s trailing median; if no window
    * settles even then, annotate-only (raw kept). This predicate is the
    * pure trigger; BenchPublishSpec gates both halves. */
  private[graft] def needsResample(samples: Array[Double],
                                   inRecordDrift: Boolean,
                                   outOfBand: Double): Boolean =
    inRecordDrift && samples.length == 3 && relSpread(samples) > outOfBand

  /** Post-resample publish decision: Some(median of the trailing
    * 3-sample window) when that window settled within the band, None
    * when even the extra samples failed to produce a settled window —
    * the caller then annotates-only and keeps the raw value, exactly
    * the pre-r17 3-sample behavior. Pure so BenchPublishSpec gates it. */
  private[graft] def settledWindow(extended: Array[Double],
                                   outOfBand: Double): Option[Double] =
    if (extended.length >= 3 && relSpread(extended.takeRight(3)) <= outOfBand) {
      val w = extended.takeRight(3).sorted
      Some(w(1))
    } else None

  /** The working tree's current git HEAD sha, by FILE reads only (no
    * process exec — the bench must not fork). Stamped into every record
    * so the ab trigger can recognize — and skip — a prior record that
    * THIS code state produced (r16 ADVICE: a re-run within a round
    * otherwise degenerates to self-comparison and reports
    * triggered:false even though the machine drifted vs the actual
    * previous round). */
  private[graft] def currentGitHead(): Option[String] = try {
    import java.nio.file.{Files, Paths, Path}
    def text(p: Path): String = new String(Files.readAllBytes(p), "UTF-8").trim
    // `.git` may be a FILE (worktree/submodule gitdir pointer) — follow
    // it, else the stamp would be null there and a same-HEAD re-run
    // would silently self-compare again (r17 self-review finding #4).
    // head:null in a record means this skip is inoperative.
    val dotGit = Paths.get(".git")
    val gitDir: Option[Path] =
      if (Files.isDirectory(dotGit)) Some(dotGit)
      else if (Files.isRegularFile(dotGit))
        text(dotGit).linesIterator.toSeq.headOption
          .filter(_.startsWith("gitdir:"))
          .map(l => Paths.get(l.drop(7).trim))
          .filter(Files.isDirectory(_))
      else None
    gitDir.flatMap { gd =>
      val headFile = gd.resolve("HEAD")
      if (!Files.exists(headFile)) None
      else {
        val head = text(headFile)
        if (!head.startsWith("ref:")) Some(head).filter(_.nonEmpty)
        else {
          val ref = head.drop(4).trim
          // refs live in the COMMON dir for worktrees (gitdir carries a
          // `commondir` pointer); the main checkout's commondir is itself
          val common = {
            val cd = gd.resolve("commondir")
            if (Files.isRegularFile(cd)) gd.resolve(text(cd)).normalize()
            else gd
          }
          val refFile = Seq(gd.resolve(ref), common.resolve(ref))
            .find(Files.exists(_))
          refFile.map(text).filter(_.nonEmpty).orElse {
            val packed = common.resolve("packed-refs")
            if (!Files.exists(packed)) None
            else text(packed).linesIterator.map(_.trim)
              .find(l => !l.startsWith("#") && l.endsWith(" " + ref))
              .map(_.split(' ')(0)).filter(_.nonEmpty)
          }
        }
      }
    }
  } catch { case _: Throwable => None }

  /** The drift-aware publishing decision (round 16, pure so it's
    * spec-gated): given a query's warm samples and its raw published
    * median (median of the last 3), return Some(value to publish
    * instead) when the query must be ANNOTATED as drifted — i.e. its
    * last-3 spread blows the sweep's band AND the calibration bracket
    * confirmed in-record machine drift. The substituted value is the
    * median of the LEAST-spread contiguous 3-sample window, in BOTH
    * directions (a drift-tainted faster median is a false speedup
    * exactly as a slower one is a false regression); queries carrying
    * only 3 samples have no alternative window and republish their raw
    * value (annotate-only). None = publish raw, no annotation. */
  private[graft] def settledPublish(samples: Array[Double], raw: Double,
                                    inRecordDrift: Boolean,
                                    outOfBand: Double): Option[Double] = {
    if (!inRecordDrift || samples.length < 3 ||
        relSpread(samples.takeRight(3)) <= outOfBand) None
    else if (samples.length == 3) Some(raw) // annotate-only (no extra
      // samples available — the main loop re-samples via [[needsResample]]
      // before reaching here, so this branch is the fallback when a
      // re-sample attempt itself failed)
    else Some(leastSpreadMedian(samples))
  }

  /** Max relative deviation of a calibration attempt vs the previous
    * record's probes (0.0 when no key overlaps). */
  private[graft] def calibDeviation(attempt: Seq[(String, Double)],
                                    prev: Map[String, Double]): Double =
    attempt.flatMap { case (k, v) =>
      prev.get(k).filter(_ > 0).map(p => math.abs(v / p - 1.0))
    }.foldLeft(0.0)(math.max)

  /** REFUSAL RULE (r18 verdict ask #3 / r19 verdict ask #1, shipped
    * r20): a record must not open with a calibration that already
    * disagrees >10% with the previous record's — that is the window the
    * r19 record published 34 phantom "regressions" from. The sweep
    * re-runs the start calibration (up to 3 retries, the main loop's
    * job) and this PURE chooser picks what to publish: the FIRST
    * attempt whose every probe is within 10% of the previous record
    * (conforming — raw cross-round deltas stand), else the
    * least-deviating attempt (the machine genuinely moved between
    * rounds; the record still publishes — the driver contract requires
    * one JSON line — but `ab.triggered` stays true and the attempt
    * count makes the refusal auditable). No baseline → first attempt,
    * trivially conforming. Returns (attempt, 1-based index, conforms). */
  private[graft] def chooseCalib(attempts: Seq[Seq[(String, Double)]],
                                 prev: Option[Map[String, Double]])
      : (Seq[(String, Double)], Int, Boolean) = prev match {
    case None => (attempts.head, 1, true)
    case Some(p) =>
      attempts.zipWithIndex
        .find { case (a, _) => calibDeviation(a, p) <= 0.10 } match {
        case Some((a, i)) => (a, i + 1, true)
        case None =>
          val (a, i) = attempts.zipWithIndex
            .minBy { case (a, _) => calibDeviation(a, p) }
          (a, i + 1, false)
      }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is INT64 TIMESTAMP(NANOS) — read as raw nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the dedup grids shuffle RDDs of primitive-array tuples — Kryo
      // (see Graft.configure) halves their exchange bytes vs Java ser
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session warmup: JVM + codegen + parquet footer caches
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables(spark, sfDir, t).count())
    // JVM-maturation warmup: three representative queries exercise the
    // shared machinery (codegen compile paths, shuffle writers, Kryo,
    // window exec) before anything is measured — without it the
    // alphabetically-first queries' "warm" medians carry early-JVM JIT
    // the resweep sentinels later measure away (sf0.1 telemetry: q01
    // 0.34 s in-sweep at uptime 60 s vs 0.15 s re-measured late)
    Seq("q10_knn_cosine", "q44_dedup_keep", "q22_token_stats")
      .filter(SparkEntry.queries.contains)
      .foreach(n => try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case _: Throwable => () })

    def time(fn: () => Unit): Double = {
      val t0 = System.nanoTime()
      fn()
      (System.nanoTime() - t0) / 1e9
    }

    // ---- machine calibration probe (round 15): the r14 record showed
    // common-93 +29% vs r13 and only a judge-run A/B (rebuild the r13
    // HEAD, re-run on the same machine) could prove the code flat — the
    // machine itself had drifted ~22% between rounds and the protocol
    // had no way to SAY so. Every record now carries a PINNED,
    // corpus-free microbenchmark on the two axes the battery spends its
    // time on, so a cross-round comparison can be normalized (or at
    // least flagged) before anyone blames the code:
    //   cpu   — sort + mix of 8M seeded longs, single-threaded driver
    //           JVM work (the codegen/kernel axis);
    //   spark — a seeded 10M-row hash-aggregate + sort through one real
    //           exchange at the session's parallelism (the
    //           codegen+shuffle machinery axis).
    // Both use the battery's own cold-then-median-of-3 protocol, and
    // the probe re-runs AFTER the sweep (_end keys) so drift DURING the
    // sweep is visible too. Consumers: BENCH.md's round-over-round
    // comparisons and tools/bench_ab.py (the interleaved two-HEAD
    // adjudicator) divide common-N by the calib ratio before calling
    // anything a regression.
    def calibrate(): Seq[(String, Double)] = {
      def cpuOnce(): Double = time { () =>
        val rnd = new java.util.Random(42L)
        val a = Array.fill(8 << 20)(rnd.nextLong())
        java.util.Arrays.sort(a)
        var acc = 0L
        var i = 0
        while (i < a.length) { acc ^= a(i) * 0x9E3779B97F4A7C15L; i += 1 }
        if (acc == 42L) System.err.print("") // defeat dead-code elimination
      }
      def sparkOnce(): Double = time { () =>
        spark.range(10000000L)
          .selectExpr("id % 1000 AS k", "hash(id) AS v")
          .groupBy("k")
          .agg(org.apache.spark.sql.functions.sum("v").as("s"),
            org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("c"))
          .orderBy("s")
          .collect()
      }
      def med3(f: () => Double): Double = {
        f() // cold (discarded — the probe obeys the sweep's own protocol)
        val xs = Array(f(), f(), f())
        java.util.Arrays.sort(xs)
        xs(1)
      }
      Seq("cpu_sort8m" -> med3(cpuOnce), "spark_agg10m" -> med3(sparkOnce))
    }
    // ---- previous-record baseline lookup (shared by the refusal rule
    // below and the ab block): newest BENCH_r*.json not produced by
    // this HEAD, or the SPARK_GRAFT_AB_PREV pin. Left = refused pin.
    val headSha = currentGitHead()
    val prevRecord: Either[String, Option[(String, String)]] = try {
      val dir = new java.io.File(".")
      val files = Option(dir.listFiles(
        (_: java.io.File, n: String) => n.matches("BENCH_r\\d+\\.json")))
        .getOrElse(Array.empty[java.io.File])
      val pinnedRaw = sys.env.get("SPARK_GRAFT_AB_PREV")
      val pinned = pinnedRaw.map(new java.io.File(_)).filter(_.isFile)
      // an explicit pin that cannot be honored must not silently fall
      // back to ambient ordering (r17 self-review finding #3) — the
      // record says so and skips the comparison instead
      if (pinnedRaw.nonEmpty && pinned.isEmpty) {
        val safe = pinnedRaw.get.replace('"', '\'').replace('\\', '/')
        Left("SPARK_GRAFT_AB_PREV=" + safe + " is not a readable file - " +
          "pin refused, comparison skipped (no silent fallback)")
      } else {
        val candidates = pinned.map(Array(_)).getOrElse(
          files.sortBy(f =>
            -"\\d+".r.findFirstIn(f.getName).fold(0)(_.toInt)))
        // newest-first, skipping records this HEAD produced (their
        // stamped sha matches) — the baseline must predate this code
        val chosen = candidates.find { f =>
          pinned.nonEmpty || headSha.forall { sha =>
            try !new String(
              java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").contains(sha)
            catch { case _: Throwable => true }
          }
        }
        Right(chosen.map(f => (f.getName,
          new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))))
      }
    } catch { case _: Throwable => Right(None) }
    // the driver wraps the compact line as an ESCAPED string inside its
    // own JSON (keys appear as `cpu_sort8m\":1.12`), so the pattern
    // tolerates an optional backslash before the closing quote
    def prevOf(txt: String, k: String): Option[Double] =
      (java.util.regex.Pattern.quote(k) + "\\\\?\"\\s*:\\s*([0-9][0-9.Ee+-]*)").r
        .findFirstMatchIn(txt).flatMap(m =>
          scala.util.Try(m.group(1).toDouble).toOption)
    val prevCalib: Option[Map[String, Double]] = prevRecord.toOption.flatten
      .map { case (_, txt) =>
        Seq("cpu_sort8m", "spark_agg10m")
          .flatMap(k => prevOf(txt, k).filter(_ > 0).map(k -> _)).toMap
      }.filter(_.nonEmpty)
    // ---- REFUSAL RULE (r18 verdict ask #3 / r19 verdict ask #1): a
    // start calibration disagreeing >10% with the previous record is
    // exactly the window the r19 record published 34 phantom
    // "regressions" from — re-measure it (up to 3 retries, short
    // settles between) instead of opening the record there; the pure
    // chooser [[chooseCalib]] picks the published attempt and
    // BenchPublishSpec gates it. If no window conforms the record still
    // publishes (the driver contract requires one JSON line) with
    // triggered:true and the attempt count in the ab block.
    val attempts = collection.mutable.Buffer(calibrate())
    while (attempts.size < 4 &&
        prevCalib.exists(p => calibDeviation(attempts.last, p) > 0.10)) {
      Thread.sleep(3000) // let a transient co-tenant/JIT window pass
      attempts += calibrate()
    }
    val (calibStart, calibAttempt, _) = chooseCalib(attempts.toSeq, prevCalib)

    // ---- sweep self-diagnosis (round 12): the driver's single sweep is
    // the published record, and rounds 10–11 saw it inflate (+12%
    // common-88, q79 +104%) in ways scratch-JVM re-runs kept exonerating.
    // Two measures make the record self-diagnosing instead:
    //  1. ISOLATION — a System.gc() before each query's warm runs, so a
    //     query measures its own work, not its predecessors' garbage
    //     (the same protocol the day_6 harness below already used);
    //  2. TELEMETRY — per-query JVM counters captured around the warm
    //     runs (GC time/count, JIT time, uptime, loaded classes, heap)
    //     plus all three warm samples, published in BENCH_DETAIL.json,
    //     so an inflated number arrives with its mechanism attached
    //     (gc_ms tells a pause, jit_ms tells a deopt storm, uptime +
    //     classes tell sweep-position pressure).
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    val jitBean = java.lang.management.ManagementFactory.getCompilationMXBean
    val clsBean = java.lang.management.ManagementFactory.getClassLoadingMXBean
    val rtBean = java.lang.management.ManagementFactory.getRuntimeMXBean
    val memBean = java.lang.management.ManagementFactory.getMemoryMXBean
    def gcMs: Long = {
      var t = 0L; gcBeans.forEach(b => t += math.max(0L, b.getCollectionTime)); t
    }
    def gcN: Long = {
      var n = 0L; gcBeans.forEach(b => n += math.max(0L, b.getCollectionCount)); n
    }
    final case class QueryTelemetry(samples: Array[Double], gcMs: Long,
                                    gcCount: Long, jitMs: Long, uptimeS: Double,
                                    loadedClasses: Long, heapMb: Long,
                                    extraSamples: Int,
                                    resampled: Boolean = false)
    val telemetry = collection.mutable.LinkedHashMap.empty[String, QueryTelemetry]

    def measure(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      try {
        def jitNow: Long = if (jitBean != null) jitBean.getTotalCompilationTime else 0L
        time(() => fn(spark, sfDir).count()) // cold (discarded)
        System.gc() // drain cross-query garbage outside the timed region
        val up0 = rtBean.getUptime / 1e3
        val cls0 = clsBean.getTotalLoadedClassCount
        val (g0, n0, j0) = (gcMs, gcN, jitNow)
        val samples = collection.mutable.ArrayBuffer.fill(3)(
          time(() => fn(spark, sfDir).count()))
        // JIT-settle the heavy tail (round 13): when a compile storm ran
        // DURING the warm samples (background compiler threads — the r12
        // record showed q64 at jit_ms 10.5 s with samples descending
        // 4.13→2.99), the early samples are partly compile interference,
        // not plan time. Take up to 2 extra samples until a sample runs
        // with < 1.5 s of background compilation, and report the median
        // of the LAST 3 — post-storm steady state. Light queries (the
        // overwhelming majority) see no extra runs and no protocol change.
        var jDelta = jitNow - j0
        var extras = 0
        while (extras < 2 && jDelta > 1500L) {
          val js = jitNow
          samples += time(() => fn(spark, sfDir).count())
          jDelta = jitNow - js
          extras += 1
        }
        val tel = QueryTelemetry(samples.toArray, gcMs - g0, gcN - n0,
          jitNow - j0, up0, cls0, memBean.getHeapMemoryUsage.getUsed >> 20,
          extras)
        telemetry.synchronized { telemetry(name) = tel }
        val last3 = samples.takeRight(3).toArray
        java.util.Arrays.sort(last3)
        last3(1) // median of the last (settled) 3
      } catch { case _: Throwable => -1.0 }

    val rawResults = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> measure(name, fn)
    }

    // END-OF-SWEEP SENTINELS: re-measure four spread-out queries (incl.
    // the two that inflated in the round-11 record) after the whole
    // q-sweep, in the SAME JVM. Late ≈ early ⇒ a moved number is
    // per-run noise; late ≈ inflated ⇒ monotonic sweep-level pressure,
    // and the telemetry row names which kind.
    val resweep = Seq("q01_pricing_summary", "q22_token_stats", "q52_bm25",
        "q79_bigram_lm")
      .filter(SparkEntry.queries.contains)
      .map(n => s"x_resweep_$n" -> measure(s"x_resweep_$n", SparkEntry.queries(n)))

    // close the calibration bracket around the q-sweep: start ≈ end ⇒
    // the machine was stationary while the record was taken; a moved
    // end probe flags in-sweep drift the resweep sentinels then localize
    val calibEnd = calibrate()
    val calib = calibStart ++ calibEnd.map { case (k, v) => (s"${k}_end", v) }

    // ---- drift-aware per-query publishing (round 16): the r15 record
    // published q64 at 5.53 s while its own telemetry held three settled
    // ~2.5 s samples — the machine degraded mid-record and the median-of-
    // last-3 rule picked the drifted window. Rule (documented in
    // BENCH.md): when a query's last-3 relative spread exceeds the
    // sweep's own variance band (3× the settled-spread p90, floor 0.25)
    // AND the calibration end-probe confirms the machine moved >10%
    // in-record, publish the median of the query's LEAST-spread
    // contiguous 3-sample window instead, and list the query under
    // "drifted" (raw median preserved there) — one degrading window can
    // no longer print a false +59% headline, and the annotation keeps
    // the substitution auditable. Queries with only 3 samples have no
    // alternative window: they are annotated, never rewritten.
    val inRecordDrift = calibStart.exists { case (k, v0) =>
      val v1 = calibEnd.find(_._1 == k).map(_._2).getOrElse(v0)
      v0 > 0 && math.abs(v1 / v0 - 1.0) > 0.10
    }
    val outOfBand = driftBand(
      telemetry.values.map(_.samples).toSeq)

    // ---- 3-sample re-sampling (round 17, verdict ask #3): the r16
    // record annotated q19/q40 but still published raw medians 3–4×
    // their own sample floors — a 3-sample query has no alternative
    // window to settle into. When the band blows AND calib confirms
    // in-record drift AND the query carries only 3 samples, take up to
    // 3 extra post-sweep samples (stopping as soon as the trailing
    // 3-window settles — the 3rd fires only when the machine changed
    // regime between sweep and re-sample, so the trailing window needs
    // to be all-fresh) and publish the settled window's median. If no
    // window settles even then, fall back to annotate-only (raw kept) —
    // the record never prints an unauditable substitution.
    val extendedSamples = collection.mutable.LinkedHashMap.empty[String, Array[Double]]
    rawResults.foreach { case (name, v) =>
      telemetry.get(name).foreach { t =>
        if (v >= 0 && needsResample(t.samples, inRecordDrift, outOfBand))
          try {
            val fn = SparkEntry.queries(name)
            var samples = t.samples
            var extras = 0
            // each extra gets measure()'s gc isolation (one System.gc()
            // immediately before the timed run — r17 ADVICE: a shared gc
            // for all extras let cross-sample garbage ride the later
            // ones); no cold discard applies — the query already ran 3+
            // times in this JVM, and the record marks these samples via
            // `resampled` + `resample_note` so the protocol mix is
            // auditable
            while (extras < 3 && relSpread(samples.takeRight(3)) > outOfBand) {
              System.gc()
              samples = samples :+ time(() => fn(spark, sfDir).count())
              extras += 1
            }
            extendedSamples(name) = samples
            // extraSamples stays the r13 JIT-settle counter (and with it
            // the record's `settled` flag keeps its documented meaning);
            // drift re-samples are marked separately as `resampled` —
            // conflating them misreported both directions (r17
            // self-review finding #2). The extra sample count is visible
            // from the samples array itself.
            telemetry.synchronized {
              telemetry(name) = t.copy(samples = samples, resampled = true)
            }
          } catch { case _: Throwable => () }
      }
    }

    val drifted = collection.mutable.LinkedHashMap.empty[String, Double]
    val results = rawResults.map { case (name, v) =>
      telemetry.get(name) match {
        case Some(t) if v >= 0 && extendedSamples.contains(name) =>
          settledWindow(extendedSamples(name), outOfBand) match {
            case Some(published) => drifted(name) = v; name -> published
            case None => drifted(name) = v; name -> v // annotate-only
          }
        case Some(t) if v >= 0 =>
          settledPublish(t.samples, v, inRecordDrift, outOfBand) match {
            case Some(published) => drifted(name) = v; name -> published
            case None => name -> v
          }
        case _ => name -> v
      }
    }

    // ---- A/B adjudication trigger (round 16): bench_ab.py proved the
    // r15 speedup on one machine, but it ran manually. Every record now
    // carries the trigger decision itself: this sweep's start calibration
    // vs the previous round's published record — when either probe moved
    // >10%, raw round-over-round deltas are NOT comparable and the
    // interleaved two-HEAD A/B (tools/bench_ab.py) must adjudicate any
    // headline claim; when both are within 10%, the record says so and
    // raw deltas stand on their own.
    // the record stamps the producing code state so a later run at the
    // SAME HEAD can recognize (and skip past) its own prior record when
    // picking the comparison baseline — without the skip, a re-run
    // within a round compared against itself and reported
    // triggered:false regardless of actual cross-round drift (r16
    // ADVICE). SPARK_GRAFT_AB_PREV pins the baseline explicitly when
    // the ambient ordering is not what the operator wants.
    val abBlock: String = prevRecord match {
      case Left(refused) =>
        s"""{"prev":null,"triggered":false,"note":"$refused"}"""
      case Right(None) =>
        """{"prev":null,"triggered":false,"note":"no prior record"}"""
      case Right(Some((name, txt))) =>
        val ratios = calibStart.flatMap { case (k, now) =>
          prevOf(txt, k).filter(_ > 0).map(prev => k -> now / prev)
        }
        if (ratios.isEmpty)
          s"""{"prev":"$name","triggered":false,"note":"prior record carries no calib keys"}"""
        else {
          val triggered = ratios.exists { case (_, r) => math.abs(r - 1.0) > 0.10 }
          val rs = ratios.map { case (k, r) =>
            "\"" + k + "_ratio\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(r))
          }.mkString(",")
          val note =
            if (triggered)
              "calib moved >10% vs the previous record even after " +
                s"${attempts.size} start-calibration attempt(s) (refusal " +
                "rule): raw deltas are not comparable — adjudicate " +
                "headline claims with tools/bench_ab.py (interleaved " +
                "two-HEAD A/B)"
            else if (attempts.size > 1)
              s"calib within 10% of the previous record on attempt " +
                s"$calibAttempt of ${attempts.size} (refusal rule: " +
                "non-conforming start windows re-measured): raw deltas stand"
            else "calib within 10% of the previous record: raw deltas stand"
          s"""{"prev":"$name",$rs,"triggered":$triggered,"calib_attempts":${attempts.size},"note":"$note"}"""
        }
    }

    // day_6-shaped workloads (BASELINE.md): k=10 search, 100 queries,
    // seeded clustered gaussians at the baseline's three dataset sizes.
    // The baseline (FAISS) is a single process with the corpus resident in
    // RAM, so the apples-to-apples serving numbers are the DRIVER-RESIDENT
    // LocalServing tiers (same kernels and results as the distributed
    // slabs — LocalServingSpec asserts identity — minus the ~10-20 ms
    // Spark job-scheduling floor a corpus this small should never pay).
    // Main key = local IVF at the baseline's own regime (nlist=100,
    // nprobe=10 — day_6/day6_complete.py:105-115); _exact = local flat
    // exhaustive; _hnsw = local HNSW (pgvector m=16/efc=64); _sq8 = local
    // scalar-quantized; _ivfsq8 = the DISTRIBUTED quantized tier and
    // _dist/_exact_dist the distributed IVF/flat — the 100 TB scale path,
    // reported alongside so the job floor is visible, not hidden.
    // _recall10 keys are ratios vs the exact oracle, not seconds.
    val day6 = Seq(
      ("x_day6_small_1k128_100q", 1000, 128),
      ("x_day6_medium_10k256_100q", 10000, 256),
      ("x_day6_large_50k384_100q", 50000, 384)
    ).flatMap { case (name, n, dim) =>
      try {
        val r = day6Workload(spark, n, dim)
        Seq(name -> r.ivfSec, s"${name}_exact" -> r.exactSec,
          s"${name}_recall10" -> r.ivfRecall,
          s"${name}_hnsw" -> r.hnswSec, s"${name}_hnsw_recall10" -> r.hnswRecall,
          s"${name}_hnsw_ef32" -> r.hnswMidSec,
          s"${name}_hnsw_ef32_recall10" -> r.hnswMidRecall,
          s"${name}_hnsw_ef48" -> r.hnswEf48Sec,
          s"${name}_hnsw_ef48_recall10" -> r.hnswEf48Recall,
          s"${name}_hnsw_ef256" -> r.hnswHiSec,
          s"${name}_hnsw_ef256_recall10" -> r.hnswHiRecall,
          s"${name}_sq8" -> r.sq8Sec, s"${name}_sq8_recall10" -> r.sq8Recall,
          s"${name}_ivfsq8" -> r.ivfSq8Sec, s"${name}_ivfsq8_recall10" -> r.ivfSq8Recall,
          s"${name}_pq" -> r.pqSec, s"${name}_pq_recall10" -> r.pqRecall,
          s"${name}_pq_refined" -> r.pqRefSec,
          s"${name}_pq_refined_recall10" -> r.pqRefRecall,
          s"${name}_ivfpq" -> r.ivfPqSec, s"${name}_ivfpq_recall10" -> r.ivfPqRecall,
          s"${name}_ivfpq_refined" -> r.ivfPqRefSec,
          s"${name}_ivfpq_refined_recall10" -> r.ivfPqRefRecall,
          s"${name}_dist" -> r.ivfDistSec, s"${name}_exact_dist" -> r.exactDistSec,
          s"${name}_batch1k_exact_dist_perq" -> r.batch1kExactPerQ,
          s"${name}_batch1k_dist_perq" -> r.batch1kIvfPerQ,
          s"${name}_batch1k_ivfsq8_perq" -> r.batch1kIvfSq8PerQ,
          s"${name}_batch1k_ivfsq8_recall10" -> r.batch1kIvfSq8Recall,
          // build-time keys (BASELINE.md publishes FAISS build times too:
          // exact/IVF/HNSW per dataset) — one-shot wall time of the
          // distributed index build, reported separately from search
          s"${name}_exact_build" -> r.buildFlatSec,
          s"${name}_build" -> r.buildIvfSec,
          s"${name}_hnsw_build" -> r.buildHnswSec,
          s"${name}_sq8_build" -> r.buildSq8Sec,
          s"${name}_ivfsq8_build" -> r.buildIvfSq8Sec,
          s"${name}_pq_build" -> r.buildPqSec,
          s"${name}_ivfpq_build" -> r.buildIvfPqSec)
      } catch { case _: Throwable => Seq(name -> -1.0) }
    }

    // beyond-driver-RAM serving route: DocumentService.overCorpus
    // (parquet doc store base + RDD-slab Mutable index) driven over a
    // real HTTP socket. Reported: bootstrap wall time, then per-request
    // latency (median of 30 sequential /api/v1/search calls, n=5) —
    // each request pays one distributed index job plus one pushed
    // point-lookup job for hydration, so this key makes the
    // scale-path's job floor visible instead of hiding it behind the
    // heap-resident tiers.
    val servingDist: Seq[(String, Double)] = try {
      val tmp = java.nio.file.Files.createTempDirectory("graft-bench-store")
      val docs = Tables(spark, sfDir, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
      val t0 = System.nanoTime()
      val svc = serving.DocumentService.overCorpus(docs, "doc_id", "text",
        operators.Embedder.MockEncoder(64), s"$tmp/store")
      val bootSec = (System.nanoTime() - t0) / 1e9
      val server = serving.HttpServing.start(svc,
        new operators.ServingCounters(spark.sparkContext, "bench"))
      try {
        def post(body: String): Unit = {
          val url = new java.net.URI(
            s"http://127.0.0.1:${server.port}/api/v1/search").toURL
          val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST")
          conn.setDoOutput(true)
          val os = conn.getOutputStream
          try os.write(body.getBytes("UTF-8")) finally os.close()
          val in = conn.getInputStream
          try in.readAllBytes() finally in.close()
          conn.disconnect()
        }
        def reqBody(i: Int): String =
          s"""{"query":"benchmark serving query number $i","n_results":5}"""
        (0 until 5).foreach(i => post(reqBody(i))) // warm (JIT + job pools)
        val lat = Array.tabulate(30) { i =>
          val s0 = System.nanoTime()
          post(reqBody(100 + i))
          (System.nanoTime() - s0) / 1e9
        }
        java.util.Arrays.sort(lat)
        Seq("x_serving_dist_bootstrap" -> bootSec,
          "x_serving_dist_search_p50" -> lat(lat.length / 2),
          "x_serving_dist_search_p90" -> lat((lat.length * 9) / 10))
      } finally server.stop()
    } catch { case _: Throwable => Seq("x_serving_dist_bootstrap" -> -1.0) }

    // one-time artifact builds the memoized queries paid on their cold
    // run (q33 IVF, q41 KMeans, q42 HNSW) — reported so memoization
    // amortizes without hiding construction cost
    val artifactBuilds = SparkEntry.artifactBuildSeconds.toSeq.sortBy(_._1)
    val total = results.collect { case (_, v) if v >= 0 => v }.sum

    // every number goes through one formatter: ROOT locale (a de_DE-style
    // default locale would emit comma decimals = invalid JSON) and a
    // non-finite guard (bare NaN/Infinity are invalid JSON too — a 0/0
    // recall must not corrupt the line; -1 is the established error mark)
    def num(v: Double, pattern: String): String = {
      val safe = if (java.lang.Double.isFinite(v)) v else -1.0
      String.format(java.util.Locale.ROOT, pattern, Double.box(safe))
    }
    def jsonMap(kvs: Seq[(String, Double)], fmt: Double => String): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // the calib map rides EVERY record (detail and compact — the driver
    // captures the compact line, and a record without its calibration
    // constant is exactly the r14 ambiguity this exists to end)
    val calibJson = jsonMap(calib, num(_, "%.4f"))
    // drifted queries ride every record with their RAW last-3 median —
    // the published queries-map value is the settled-window median, so
    // the substitution is auditable in the record itself
    val driftedJson =
      if (drifted.isEmpty) ""
      else s""","drifted":${jsonMap(drifted.toSeq, num(_, "%.3f"))}"""
    // the producing HEAD rides every record (see abBlock: it is how a
    // later run at this HEAD knows to skip this record as its baseline)
    val headJson = headSha.fold("null")(s => "\"" + s + "\"")
    def line(qs: String): String =
      s"""{"metric":"total","value":${num(total, "%.3f")},"unit":"sec","queries":$qs,"calib":$calibJson,"head":$headJson,"ab":$abBlock$driftedJson,"sf":"$sfDir"}"""

    // Full-precision detail (all q* + artifact builds + resweep
    // sentinels + x_day6 serving keys) goes to a sidecar file and a
    // first stdout line. The LAST stdout line is a compact per-query
    // map kept under the driver's 2000-char tail-capture window
    // (rounds 1–5 emitted one ~6 KB line whose opening brace fell
    // outside the window → `parsed: null`).
    val detail = line(jsonMap(results ++ artifactBuilds ++ resweep ++ day6 ++ servingDist,
      num(_, "%.9f")))
    // the sidecar additionally carries the sweep's self-diagnosis:
    // per-query JVM telemetry + warm samples, StageCache reuse counters,
    // and the in-sweep variance model (relative spread of the 3 warm
    // samples) a future record should be judged against
    val telJson = telemetry.toSeq.map { case (k, t) =>
      s""""$k":{"samples":[${t.samples.map(num(_, "%.4f")).mkString(",")}]""" +
        s""","gc_ms":${t.gcMs},"gc_count":${t.gcCount},"jit_ms":${t.jitMs}""" +
        s""","uptime_s":${num(t.uptimeS, "%.1f")},"loaded_classes":${t.loadedClasses}""" +
        // JIT-settle marker (round 14, per ADVICE): samples is
        // variable-length (3-5) since the r13 settle protocol; consumers
        // comparing rounds must key on `settled` — a settled query's
        // median came from post-compile-storm samples, so its delta vs a
        // pre-r13 record partly reflects the protocol, not the plan
        s""","heap_mb":${t.heapMb},"extra_samples":${t.extraSamples}""" +
        s""","settled":${t.extraSamples > 0},"resampled":${t.resampled}""" +
        // resampled extras are post-sweep, gc-isolated per sample, no
        // cold discard (already warm) — a different window than the
        // in-sweep samples, so the record says so next to the flag
        (if (t.resampled)
          s""","resample_note":"extras post-sweep, gc per sample, no cold discard"""" else "") +
        s""","drifted":${drifted.contains(k)}}"""
    }.mkString("{", ",", "}")
    val scJson = operators.StageCache.hitMissCounts.toSeq.sortBy(_._1)
      .map { case (k, (h, m)) => s""""$k":{"hits":$h,"misses":$m}""" }
      .mkString("{", ",", "}")
    val spreads = telemetry.values
      .map { t =>
        // spread of the SETTLED window (the last 3 samples — the ones
        // the median came from); JIT-settled queries may carry up to 5
        val s = t.samples.takeRight(3).sorted
        if (s(1) > 0) (s(2) - s(0)) / s(1) else 0.0
      }
      .toArray.sorted
    val varJson =
      if (spreads.isEmpty) "{}"
      else s"""{"rel_spread_p50":${num(spreads(spreads.length / 2), "%.4f")}""" +
        s""","rel_spread_p90":${num(spreads((spreads.length * 9) / 10), "%.4f")}""" +
        s""","rel_spread_max":${num(spreads.last, "%.4f")},"n":${spreads.length}}"""
    // tier-role annotation (r18, verdict ask #6): the unrefined PQ
    // tiers are CANDIDATE GENERATORS — isotropic gaussians are PQ's
    // hard case and their raw recall@10 (0.24 pq / 0.46 ivfpq at
    // 50k×384) is published as such, not as a serving operating point;
    // the production configurations are the _refined siblings
    // (4× over-fetch + exact rerank, FAISS IndexRefineFlat pattern).
    val tierRoles =
      """{"pq":"candidate-generation-only: unrefined recall published for honesty, serve via _pq_refined","ivfpq":"candidate-generation-only: serve via _ivfpq_refined (over-fetch + exact rerank)"}"""
    try {
      val p = java.nio.file.Paths.get("BENCH_DETAIL.json")
      val extended = detail.dropRight(1) +
        s""","telemetry":$telJson,"stagecache":$scJson,"variance_model":$varJson,"tier_roles":$tierRoles}"""
      java.nio.file.Files.write(p, (extended + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop() // stop first: nothing may print after the compact line

    println(detail)
    // compact line: keys are the unique qNN prefixes (full names live in
    // BENCH_DETAIL.json and the detail line — 76 full names no longer fit
    // the driver's 2000-char tail window at ANY precision); ms precision,
    // degrading if the line would overflow, and as the PROVABLY-BOUNDED
    // last resort drop the per-query map entirely — a parseable total
    // beats a truncated map
    val shortKeyed = results.map { case (k, v) => (k.takeWhile(_ != '_'), v) }
    val compactKvs =
      if (shortKeyed.map(_._1).distinct.size == results.size) shortKeyed else results
    val compact = Seq(3, 2, 1).map(p => line(jsonMap(compactKvs, num(_, s"%.${p}f"))))
      .find(_.length <= 1800)
      .getOrElse(line("{}"))
    println(compact)
  }

  private final case class Day6(
      batch1kExactPerQ: Double, batch1kIvfPerQ: Double,
      batch1kIvfSq8PerQ: Double, batch1kIvfSq8Recall: Double,
      ivfSec: Double, exactSec: Double, ivfRecall: Double,
      hnswSec: Double, hnswRecall: Double,
      hnswMidSec: Double, hnswMidRecall: Double,
      hnswEf48Sec: Double, hnswEf48Recall: Double,
      hnswHiSec: Double, hnswHiRecall: Double,
      sq8Sec: Double, sq8Recall: Double,
      ivfSq8Sec: Double, ivfSq8Recall: Double,
      pqSec: Double, pqRecall: Double,
      pqRefSec: Double, pqRefRecall: Double,
      ivfPqSec: Double, ivfPqRecall: Double,
      ivfPqRefSec: Double, ivfPqRefRecall: Double,
      ivfDistSec: Double, exactDistSec: Double,
      buildFlatSec: Double, buildIvfSec: Double, buildHnswSec: Double,
      buildSq8Sec: Double, buildIvfSq8Sec: Double,
      buildPqSec: Double, buildIvfPqSec: Double)

  /** Generate a baseline dataset (seed-42 clustered gaussians, 100
    * clusters — day_6/day6_complete.py:26-52 shape), build the resident
    * serving indexes (each build separately timed into a `_build` key,
    * like FAISS's separately-published build times), collect the
    * sub-budget corpus into the LocalServing tiers, and time the warm
    * 100-query top-10 batches on both the local (headline) and
    * distributed (scale-path) tiers — recalls vs the exact oracle. */
  private def day6Workload(spark: SparkSession, n: Int, dim: Int): Day6 = {
    import spark.implicits._
    val nClusters = 100
    val d = dim
    val centers = Array.tabulate(nClusters) { c =>
      val r = new java.util.Random(42L + c)
      Array.fill(d)(r.nextGaussian() * 5.0)
    }
    val bcCenters = spark.sparkContext.broadcast(centers)
    val docs = spark.range(n.toLong).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val ctr = bcCenters.value((id % nClusters).toInt)
          val r = new java.util.Random(1000L + id)
          (id, Array.tabulate(d)(i => (ctr(i) + r.nextGaussian()).toFloat))
        }
      }
      .rdd
      .cache()
    docs.count() // materialize once: the builds below make ~14 passes
    val queries = (0 until 100).map { q =>
      val r = new java.util.Random(9000L + q)
      val ctr = centers(q % nClusters)
      (q.toLong, Array.tabulate(d)(i => (ctr(i) + r.nextGaussian()).toFloat))
    }.toArray
    // builds are timed one-shot (no warmup): FAISS's published build
    // numbers are the same single train+add wall time on resident data
    def buildTimed[T](fn: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = fn
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (flat, buildFlatSec) = buildTimed(operators.ServingIndex.buildFlat(docs, dim))
    // IVF scans ~nprobe/nlist of each slab: per-task work is small, so
    // fewer slabs trade unused parallelism for a lower scheduling floor
    val (ivf, buildIvfSec) = buildTimed(operators.ServingIndex.buildIvf(docs, dim,
      nlist = math.min(100, n / 10), iterations = 10, numSlabs = 16))
    // pgvector's config (m=16, ef_construction=64); baseline HNSW rows are
    // FAISS HNSWFlat M=32 (recall@10 large = 0.485 — ours must beat it)
    val (hnsw, buildHnswSec) = buildTimed(operators.HnswIndex.build(docs, dim, m = 16,
      efConstruction = 64, operators.KnnSearch.L2, numShards = 16))
    // SQ8: the 4×-less-memory tier; exhaustive ADC scan over uint8 codes
    val (sq8, buildSq8Sec) = buildTimed(operators.ServingIndex.buildSq8(docs, dim))
    // IVF+SQ8: cluster pruning AND quantized memory (the 100 TB tier)
    val (ivfSq8, buildIvfSq8Sec) = buildTimed(operators.ServingIndex.buildIvfSq8(docs, dim,
      nlist = math.min(100, n / 10), iterations = 10, numSlabs = 16))
    // PQ tiers at dim/4 subspaces (4 dims/codeword, 16x below float32):
    // flat PQ + candidate-refine, and the residual IVF+PQ composition —
    // the RAM-constrained 100 TB configurations. Isotropic gaussians are
    // PQ's hard case (recall keys tell it honestly); the _pq_refined key
    // is the production pattern (4x over-fetch + exact rerank, FAISS
    // IndexRefineFlat) and recovers ~exact recall
    val pqM = dim / 4
    val (pq, buildPqSec) = buildTimed(operators.PqIndex.buildPq(docs, dim, m = pqM,
      iterations = 10, numSlabs = 16))
    val (ivfPq, buildIvfPqSec) = buildTimed(operators.PqIndex.buildIvfPq(docs, dim,
      nlist = math.min(100, n / 10), m = pqM, iterations = 10, numSlabs = 16))
    // local serving tiers: one collect each of the already-built slabs —
    // results identical to the distributed tiers (LocalServingSpec)
    val localFlat = operators.LocalServing.flatFrom(flat)
    val localIvf = operators.LocalServing.ivfFrom(ivf)
    val localHnsw = operators.LocalServing.hnswFrom(hnsw)
    val localSq8 = operators.LocalServing.sq8From(sq8)
    val localPq = operators.PqIndex.localFrom(pq)
    val localIvfPq = operators.PqIndex.localIvfPqFrom(ivfPq)
    val refineLookup = operators.PqIndex.flatLookup(localFlat)
    // blocking: a lazy unpersist can evict blocks DURING the timed loops
    // below (the r5 driver run showed a 26x exact_dist outlier from
    // build-phase interference) — drain it fully before measuring
    docs.unpersist(blocking = true) // the indexes hold their own resident slabs
    System.gc() // drain build garbage outside the timed region
    // warm twice, then min of 9 — a single ~30 ms measurement is at the
    // mercy of one straggler task wakeup or a neighboring tenant; the min
    // is the standard steady-state latency estimator at this scale, and
    // more reps only tighten it (total cost still well under a second)
    def timed(fn: () => Unit): Double = {
      fn(); fn() // warm (JIT tiers + scheduler pools)
      Array.fill(9) {
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.min
    }
    var exactRes: Array[(Long, Array[(Float, Long)])] = null
    var ivfRes: Array[(Long, Array[(Float, Long)])] = null
    var hnswRes: Array[(Long, Array[(Float, Long)])] = null
    var sq8Res: Array[(Long, Array[(Float, Long)])] = null
    var ivfSq8Res: Array[(Long, Array[(Float, Long)])] = null
    // headline: the local (single-node-resident) tiers — FAISS's regime
    val exactSec = timed(() => exactRes = localFlat.search(queries, 10, operators.KnnSearch.L2))
    val ivfSec = timed(() =>
      ivfRes = localIvf.search(queries, 10, nprobe = 10, operators.KnnSearch.L2))
    val hnswSec = timed(() => hnswRes = localHnsw.search(queries, 10, efSearch = 64))
    // the ef knob is HNSW's recall/latency dial — publish the curve's
    // two ends around the ef64 default (hnswlib's own bench sweeps ef
    // the same way). Since the r17 diversity-selection build (Malkov
    // Alg. 4 — see HnswIndex.buildShard) the whole curve sits at
    // recall ≈ 1.0 on the day_6 large workload, with ef32 ≈ 0.9× the
    // FAISS baseline wall; the keys keep their names for round-over-
    // round continuity
    var hnswMidRes: Array[(Long, Array[(Float, Long)])] = null
    val hnswMidSec = timed(() => hnswMidRes = localHnsw.search(queries, 10, efSearch = 32))
    // ef48: the r15 operating point (<=1.5x baseline wall at recall
    // >=0.8), kept for continuity — post-diversity it is dominated by
    // ef32 on both axes
    var hnswEf48Res: Array[(Long, Array[(Float, Long)])] = null
    val hnswEf48Sec = timed(() => hnswEf48Res = localHnsw.search(queries, 10, efSearch = 48))
    var hnswHiRes: Array[(Long, Array[(Float, Long)])] = null
    val hnswHiSec = timed(() => hnswHiRes = localHnsw.search(queries, 10, efSearch = 256))
    val sq8Sec = timed(() => sq8Res = localSq8.search(queries, 10, operators.KnnSearch.L2))
    var pqRes: Array[(Long, Array[(Float, Long)])] = null
    var pqRefRes: Array[(Long, Array[(Float, Long)])] = null
    var ivfPqRes: Array[(Long, Array[(Float, Long)])] = null
    val pqSec = timed(() => pqRes = localPq.search(queries, 10, operators.KnnSearch.L2))
    val pqRefSec = timed(() => pqRefRes = operators.PqIndex.searchRefined(
      localPq, queries, 10, kCand = 400, refineLookup, operators.KnnSearch.L2))
    val ivfPqSec = timed(() =>
      ivfPqRes = localIvfPq.search(queries, 10, nprobe = 10, operators.KnnSearch.L2))
    // the refined composition: nprobe bounds cell recall, the exact
    // rerank undoes PQ blur within the fetched candidates
    var ivfPqRefRes: Array[(Long, Array[(Float, Long)])] = null
    val ivfPqRefSec = timed(() => ivfPqRefRes = operators.PqIndex.searchRefinedIvf(
      localIvfPq, queries, 10, kCand = 400, nprobe = 10, refineLookup))
    // scale path: distributed slab tiers (pay the job-scheduling floor).
    // GC first: the local-tier loops above allocate result garbage, and a
    // collection landing inside a ~20 ms distributed batch dominates it
    System.gc()
    val exactDistSec = timed(() => flat.search(queries, 10, operators.KnnSearch.L2))
    val ivfDistSec = timed(() =>
      ivf.search(queries, 10, nprobe = 10, operators.KnnSearch.L2))
    val ivfSq8Sec = timed(() =>
      ivfSq8Res = ivfSq8.search(queries, 10, nprobe = 10, operators.KnnSearch.L2))
    // serving-THROUGHPUT row (round 17 ask #4): the distributed tiers
    // pay one ~15-20 ms job-scheduling floor per BATCH, which at the
    // FAISS workload's 100 queries dominates their per-query wall. A
    // 1000-query batch — still one fused runJob, driver merge bounded by
    // partitions × |Q| × k tuples — divides the floor 10×; the keys are
    // WALL PER QUERY (seconds), directly comparable to BASELINE.md's
    // 100-query totals ÷ 100. All three dataset scales (r18, verdict
    // ask #5: the small/medium rows were -1.0 sentinels; the batch rows
    // cost ~1 s per tier, so there was no reason to skip them).
    var b1kExact = -1.0; var b1kIvf = -1.0; var b1kSq8 = -1.0
    var b1kSq8Recall = -1.0
    locally {
      val queries1k = (0 until 1000).map { q =>
        val r = new java.util.Random(9000L + q)
        val ctr = centers(q % nClusters)
        (q.toLong, Array.tabulate(d)(i => (ctr(i) + r.nextGaussian()).toFloat))
      }.toArray
      var sq8Res1k: Array[(Long, Array[(Float, Long)])] = null
      var exactRes1k: Array[(Long, Array[(Float, Long)])] = null
      b1kExact = timed(() =>
        flat.search(queries1k, 10, operators.KnnSearch.L2)) / 1000.0
      b1kIvf = timed(() =>
        ivf.search(queries1k, 10, nprobe = 10, operators.KnnSearch.L2)) / 1000.0
      b1kSq8 = timed(() => sq8Res1k =
        ivfSq8.search(queries1k, 10, nprobe = 10, operators.KnnSearch.L2)) / 1000.0
      // recall oracle for the 1k batch: the local exact tier (identical
      // results to the distributed flat — LocalServingSpec), untimed
      exactRes1k = localFlat.search(queries1k, 10, operators.KnnSearch.L2)
      val sets1k = exactRes1k.map { case (q, arr) => q -> arr.map(_._2).toSet }.toMap
      b1kSq8Recall = sq8Res1k.map { case (q, arr) =>
        arr.map(_._2).count(sets1k(q).contains).toDouble / sets1k(q).size
      }.sum / sq8Res1k.length
    }
    val exactSets = exactRes.map { case (q, arr) => q -> arr.map(_._2).toSet }.toMap
    def recallOf(res: Array[(Long, Array[(Float, Long)])]): Double =
      res.map { case (q, arr) =>
        arr.map(_._2).count(exactSets(q).contains).toDouble / exactSets(q).size
      }.sum / res.length
    val recall = recallOf(ivfRes)
    val hnswRecall = recallOf(hnswRes)
    val hnswMidRecall = recallOf(hnswMidRes)
    val hnswEf48Recall = recallOf(hnswEf48Res)
    val hnswHiRecall = recallOf(hnswHiRes)
    val sq8Recall = recallOf(sq8Res)
    val ivfSq8Recall = recallOf(ivfSq8Res)
    val pqRecall = recallOf(pqRes)
    val pqRefRecall = recallOf(pqRefRes)
    val ivfPqRecall = recallOf(ivfPqRes)
    val ivfPqRefRecall = recallOf(ivfPqRefRes)
    flat.slabs.unpersist(); ivf.slabs.unpersist(); hnsw.shards.unpersist()
    sq8.slabs.unpersist(); ivfSq8.slabs.unpersist()
    pq.slabs.unpersist(); ivfPq.slabs.unpersist()
    Day6(b1kExact, b1kIvf, b1kSq8, b1kSq8Recall,
      ivfSec, exactSec, recall, hnswSec, hnswRecall,
      hnswMidSec, hnswMidRecall, hnswEf48Sec, hnswEf48Recall,
      hnswHiSec, hnswHiRecall,
      sq8Sec, sq8Recall, ivfSq8Sec, ivfSq8Recall, pqSec, pqRecall,
      pqRefSec, pqRefRecall, ivfPqSec, ivfPqRecall, ivfPqRefSec, ivfPqRefRecall,
      ivfDistSec, exactDistSec,
      buildFlatSec, buildIvfSec, buildHnswSec,
      buildSq8Sec, buildIvfSq8Sec, buildPqSec, buildIvfPqSec)
  }
}
