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

  test("every query runs non-empty at sf0.001 except threshold queries") {
    val allowEmpty = Set("q24_dedup_stats") // stats row is always 1 row — none may be empty
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.sfDir).count()
      assert(n > 0 || allowEmpty(name), s"$name returned 0 rows")
    }
  }
}
