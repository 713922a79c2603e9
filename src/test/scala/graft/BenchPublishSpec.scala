package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The drift-aware publishing rule (BENCH.md "Per-query publishing
 * rule") as executable spec: the q64 false-headline class — a machine
 * degrading mid-record printing a fake regression — must be corrected
 * and annotated, per-query noise on a stationary machine must pass
 * through untouched, and the correction must apply in BOTH directions.
 */
class BenchPublishSpec extends AnyFunSuite {

  private val band = 0.25

  test("the r15 q64 shape: settled early samples, drifted tail -> settled median, annotated") {
    // the literal telemetry that motivated the rule
    val samples = Array(2.52, 2.30, 2.64, 5.53, 11.60)
    val published = Bench.settledPublish(samples, raw = 5.53,
      inRecordDrift = true, outOfBand = band)
    assert(published === Some(2.52),
      "must publish the least-spread window's median ([2.30,2.52,2.64] -> 2.52)")
  }

  test("fast-direction drift is corrected too (no false speedups)") {
    // machine speeds up mid-record: last-3 median is drift-tainted LOW
    val samples = Array(5.0, 5.1, 4.9, 2.5, 2.4)
    val published = Bench.settledPublish(samples, raw = 2.5,
      inRecordDrift = true, outOfBand = band)
    assert(published.exists(_ >= 4.9),
      s"a drift-tainted faster median is a false speedup: $published")
  }

  test("blown spread on a STATIONARY machine passes through (per-query noise)") {
    val samples = Array(2.5, 2.6, 9.0, 2.4, 8.0)
    assert(Bench.settledPublish(samples, raw = 8.0,
      inRecordDrift = false, outOfBand = band) === None)
  }

  test("in-band samples on a drifted machine pass through") {
    val samples = Array(2.50, 2.55, 2.52)
    assert(Bench.settledPublish(samples, raw = 2.52,
      inRecordDrift = true, outOfBand = band) === None)
  }

  test("3-sample queries with blown spread annotate without rewriting") {
    val samples = Array(2.0, 2.1, 9.0)
    assert(Bench.settledPublish(samples, raw = 2.1,
      inRecordDrift = true, outOfBand = band) === Some(2.1),
      "no alternative window exists — annotate-only, raw value kept")
  }

  test("the band is the sweep's own: 3x settled-spread p90, floored at 0.25") {
    val tight = Seq.fill(20)(Array(1.0, 1.01, 1.02))
    assert(Bench.driftBand(tight) === 0.25, "floor binds on a quiet sweep")
    val noisy = Seq.fill(20)(Array(1.0, 1.5, 2.0))
    assert(Bench.driftBand(noisy) > 0.25 &&
      Bench.driftBand(noisy) === 3.0 * Bench.relSpread(Array(1.0, 1.5, 2.0)))
  }

  test("p90 is nearest-rank: one blown window in a 10-query sweep no longer sets the band") {
    // r16 ADVICE: the floor-index form (n*9)/10 picked the MAXIMUM
    // spread for sweeps of <=10 samples — a single blown window then
    // inflated the band and suppressed its own annotation
    val nine = Seq.fill(9)(Array(1.0, 1.01, 1.02))
    val one = Seq(Array(1.0, 5.0, 9.0)) // spread 1.6
    val band = Bench.driftBand(nine ++ one)
    assert(band === 0.25,
      s"the blown window must fall above p90, leaving the floor: $band")
  }

  test("3-sample drifted queries trigger a re-sample; settled ones do not") {
    assert(Bench.needsResample(Array(0.3, 1.2, 1.3), inRecordDrift = true,
      outOfBand = band), "blown 3-sample spread under drift -> re-sample")
    assert(!Bench.needsResample(Array(0.3, 1.2, 1.3), inRecordDrift = false,
      outOfBand = band), "stationary machine -> per-query noise, no re-sample")
    assert(!Bench.needsResample(Array(1.2, 1.25, 1.3), inRecordDrift = true,
      outOfBand = band), "in-band 3-sample window -> no re-sample")
    assert(!Bench.needsResample(Array(0.3, 1.2, 1.3, 1.25), inRecordDrift = true,
      outOfBand = band), "4+ samples have a window to settle into already")
  }

  test("re-sampled queries publish the settled trailing window's median") {
    // the q19 shape: two drift-inflated samples, extras land at the floor
    val extended = Array(0.3, 1.2, 1.3, 0.31, 0.32, 0.30)
    assert(Bench.settledWindow(extended, band) === Some(0.31),
      "trailing [0.31,0.32,0.30] settled -> publish its median")
    // extras failed to settle (machine still moving) -> annotate-only
    val unsettled = Array(0.3, 1.2, 1.3, 0.31, 2.0)
    assert(Bench.settledWindow(unsettled, band) === None,
      "no settled window even after extras -> raw kept, annotated")
  }

  test("leastSpreadMedian picks the quietest contiguous window in both directions") {
    assert(Bench.leastSpreadMedian(Array(2.52, 2.30, 2.64, 5.53, 11.60)) === 2.52)
    assert(Bench.leastSpreadMedian(Array(5.0, 5.1, 4.9, 2.5, 2.4)) === 5.0)
  }

  test("calibDeviation: max relative deviation over shared keys only") {
    val prev = Map("cpu_sort8m" -> 1.0, "spark_agg10m" -> 0.5)
    assert(math.abs(
      Bench.calibDeviation(Seq("cpu_sort8m" -> 1.05), prev) - 0.05) < 1e-12)
    assert(math.abs(Bench.calibDeviation(
      Seq("cpu_sort8m" -> 1.2, "spark_agg10m" -> 0.45), prev) - 0.2) < 1e-12)
    // unknown keys are ignored; nothing shared -> 0 (trivially conforming)
    assert(Bench.calibDeviation(Seq("other" -> 9.0), prev) === 0.0)
  }

  test("refusal rule: first conforming attempt published, else least-deviating") {
    val prev = Some(Map("cpu_sort8m" -> 1.0))
    val bad = Seq("cpu_sort8m" -> 1.3)
    val worse = Seq("cpu_sort8m" -> 1.5)
    val good = Seq("cpu_sort8m" -> 1.05)
    // first conforming attempt wins, with its 1-based index
    assert(Bench.chooseCalib(Seq(bad, good, worse), prev) === ((good, 2, true)))
    // a conforming FIRST attempt never retries past itself
    assert(Bench.chooseCalib(Seq(good), prev) === ((good, 1, true)))
    // no conforming window: publish the least-deviating one, non-conforming
    assert(Bench.chooseCalib(Seq(worse, bad), prev) === ((bad, 2, false)))
    // no baseline: first attempt, trivially conforming
    assert(Bench.chooseCalib(Seq(bad, good), None) === ((bad, 1, true)))
  }

  test("published wall never exceeds 1.5x the settled floor without annotation") {
    // the verdict's acceptance invariant, fuzzed over random sweeps
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val n = 3 + rnd.nextInt(3)
      val samples = Array.fill(n)(0.5 + rnd.nextDouble() * 10.0)
      val last3 = samples.takeRight(3).sorted
      val raw = last3(1)
      Bench.settledPublish(samples, raw, inRecordDrift = true,
          outOfBand = band) match {
        case Some(pub) => () // annotated — any substitution is audited
        case None =>
          // unannotated: the raw median's window was in-band, so it
          // cannot sit far above its own window floor
          assert(raw <= 1.5 * last3(0) || Bench.relSpread(last3) > band,
            s"unannotated publish $raw vs floor ${last3(0)} " +
              s"(samples ${samples.mkString(",")})")
      }
    }
  }
}
