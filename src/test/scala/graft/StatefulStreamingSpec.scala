package graft

import graft.streaming.EventStream
import org.scalatest.funsuite.AnyFunSuite

class StatefulStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val NS = 1000000000L
  private val gap = 1800L * NS

  private def rows(name: String): Set[(Long, Long, Double, Long)] = {
    import spark.implicits._
    spark.table(name).as[EventStream.UserSession].collect()
      .map(s => (s.user_id, s.n_events, s.total_value, s.end_ns)).toSet
  }

  /** Timeout flushes run in engine-scheduled extra micro-batches that
    * `processAllAvailable` does not always wait for — poll to a deadline. */
  private def eventuallyRows(name: String, expected: Set[(Long, Long, Double, Long)]): Unit = {
    val deadline = System.nanoTime() + 30L * NS
    var got = rows(name)
    while (got != expected && System.nanoTime() < deadline) {
      Thread.sleep(100)
      got = rows(name)
    }
    assert(got === expected)
  }

  test("gap closure within and across batches; watermark flushes tail sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)]
    val sessions = EventStream.sessionizeStateful(mem.toDS(), gap)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      // all timestamps sit above a base offset: an event at exactly the
      // initial watermark (epoch 0) is dropped as late by the stateful
      // operator's late-row filter
      val B = 100000L * NS
      // user 1: two events 10 min apart (one session), then a 2-hour jump
      // → first session closes mid-batch (gap closure, not timeout)
      mem.addData(
        (1L, B, 1.0), (1L, B + 600L * NS, 2.0),
        (1L, B + 7800L * NS, 5.0),
        (2L, B, 9.0))
      q.processAllAvailable()
      val u1First = (1L, 2L, 3.0, B + 600L * NS)
      assert(rows("sessions_out").contains(u1First))

      // next batch: user 1 continues within gap (extends open session);
      // user 2 jumps past the gap (closes their first session — by gap if
      // the timeout flush hasn't fired yet, by timeout otherwise; exactly
      // one row either way)
      mem.addData((1L, B + 8000L * NS, 1.0), (2L, B + 99999L * NS, 1.0))
      q.processAllAvailable()
      assert(rows("sessions_out").contains((2L, 1L, 9.0, B)))

      // sentinel from an unrelated user pushes the watermark far past every
      // open session's close point: the tails of users 1 and 2 flush with
      // NO further events from them — the watermark-driven final flush
      mem.addData((99L, B + 999999L * NS, 0.0))
      q.processAllAvailable()
      eventuallyRows("sessions_out", Set(
        u1First,
        (1L, 2L, 6.0, B + 8000L * NS),   // user 1 tail (7800s + 8000s)
        (2L, 1L, 9.0, B),                // user 2 first session
        (2L, 1L, 1.0, B + 99999L * NS))) // user 2 tail
      // (user 99's own session stays open: nothing outruns its close point)
    } finally q.stop()
  }

  test("out-of-order event inside the watermark widens, never regresses, the open session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)]
    val sessions = EventStream.sessionizeStateful(mem.toDS(), gap)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_ooo").start()
    try {
      val B = 100000L * NS
      // batch 1: open session [B, B+1000s]
      mem.addData((5L, B, 1.0), (5L, B + 1000L * NS, 2.0))
      q.processAllAvailable()
      // batch 2: a LATE row at B+500s — inside the session and well above
      // the watermark (B+1000s − 1800s). It must merge without pulling the
      // session's end time back to B+500s
      mem.addData((5L, B + 500L * NS, 4.0))
      q.processAllAvailable()
      // batch 3: in-order row at B+2400s — 1400s after the true end
      // (inside the gap). Under the regression bug the end would read
      // B+500s, the 1900s delta would exceed the gap, and the session
      // would spuriously split here
      mem.addData((5L, B + 2400L * NS, 8.0))
      q.processAllAvailable()
      assert(rows("sessions_ooo").isEmpty, "no spurious split")
      // sentinel flushes the tail: one session covering all four events
      mem.addData((99L, B + 999999L * NS, 0.0))
      q.processAllAvailable()
      eventuallyRows("sessions_ooo", Set((5L, 4L, 15.0, B + 2400L * NS)))
    } finally q.stop()
  }
}
