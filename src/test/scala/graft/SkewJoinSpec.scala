package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join is row-identical to the plain join on skewed data") {
    import spark.implicits._
    // 90% of the big side lands on one hot key
    val big = (0 until 5000).map { i =>
      val k = if (i % 10 != 0) 7L else (i % 100).toLong
      (k, s"row $i")
    }.toDF("key", "payload")
    val small = (0L until 100L).map(k => (k, s"dim $k")).toDF("key", "attr")
    val salted = SkewJoin.saltedJoin(big, small, "key", salts = 8)
      .select("key", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val plain = big.join(small, "key")
      .select("key", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(salted.length === 5000)
    assert(salted.toSeq === plain.toSeq)
  }

  test("the join key carries the salt: hot-key rows shuffle to many partitions") {
    import spark.implicits._
    val big = (0 until 1000).map(i => (7L, s"row $i")).toDF("key", "payload")
    val small = Seq((7L, "dim")).toDF("key", "attr")
    val salted = SkewJoin.saltedJoin(big, small, "key", salts = 8)
    // the physical shuffle must partition on (key, __salt), not key alone
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt column must reach the exchange:\n$plan")
    // all 8 salt values are actually used by 1000 hot-key rows (the
    // operator's own round-robin scatter expression)
    val saltsUsed = big.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(saltsUsed === 8)
    assert(salted.count() === 1000)
  }

  test("salts=1 degenerates to the plain join; empty sides behave") {
    import spark.implicits._
    val big = Seq((1L, "a"), (2L, "b")).toDF("key", "payload")
    val small = Seq((1L, "x")).toDF("key", "attr")
    assert(SkewJoin.saltedJoin(big, small, "key", 1).count() === 1)
    val empty = spark.emptyDataFrame.select(lit(0L).as("key"), lit("").as("attr")).where(lit(false))
    assert(SkewJoin.saltedJoin(big, empty, "key", 4).count() === 0)
  }
}
