package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage of the driver contract itself. */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("q90 reuses q84's cached index frames and memoizes its pair frame (StageCache hits)") {
    import graft.operators.StageCache
    def hits(k: String) = StageCache.hitMissCounts.get(k).map(_._1).getOrElse(0L)
    def misses(k: String) = StageCache.hitMissCounts.get(k).map(_._2).getOrElse(0L)
    val bKey = "q84_ix_buckets_16x4_sh3_lt400"
    val sKey = "q84_ix_sets_sh3_lt400"
    val pKey = "q90_facade_pairs_t05_ge400"
    // q84 populates the shared index frames…
    SparkEntry.queries("q84_delta_near_dup")(spark, TestSpark.sfDir).count()
    val (h0b, h0s, m0b, m0s) = (hits(bKey), hits(sKey), misses(bKey), misses(sKey))
    // …and q90 must HIT them (reuse), never rebuild (miss)
    SparkEntry.queries("q90_delta_facade")(spark, TestSpark.sfDir).count()
    assert(hits(bKey) > h0b && hits(sKey) > h0s,
      s"q90 must reuse q84's index frames: ${StageCache.hitMissCounts}")
    assert(misses(bKey) === m0b && misses(sKey) === m0s,
      s"q90 must not rebuild q84's index frames: ${StageCache.hitMissCounts}")
    // the facade's own pair frame memoizes: a second run hits it
    val (hp, mp) = (hits(pKey), misses(pKey))
    SparkEntry.queries("q90_delta_facade")(spark, TestSpark.sfDir).count()
    assert(hits(pKey) === hp + 1 && misses(pKey) === mp,
      s"q90 pair frame must memoize across runs: ${StageCache.hitMissCounts}")
  }

  test("every query runs non-empty at sf0.001 except threshold queries") {
    val allowEmpty = Set("q24_dedup_stats") // stats row is always 1 row — none may be empty
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.sfDir).count()
      assert(n > 0 || allowEmpty(name), s"$name returned 0 rows")
    }
  }
}
