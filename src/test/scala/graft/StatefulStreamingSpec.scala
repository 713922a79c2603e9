package graft

import graft.streaming.EventStream
import org.scalatest.funsuite.AnyFunSuite

class StatefulStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flatMapGroupsWithState closes sessions on gap within and across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)]
    val NS = 1000000000L
    val gap = 1800L * NS
    val sessions = EventStream.sessionizeStateful(mem.toDS(), gap)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      // user 1: two events 10 min apart (one session), then a 2-hour jump
      // → first session closes mid-batch
      mem.addData(
        (1L, 0L, 1.0), (1L, 600L * NS, 2.0),
        (1L, 7800L * NS, 5.0),
        (2L, 0L, 9.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[EventStream.UserSession].collect()
      assert(closed.length === 1)
      assert(closed.head.user_id === 1L)
      assert(closed.head.n_events === 2L)
      assert(closed.head.total_value === 3.0)
      assert(closed.head.end_ns === 600L * NS)

      // next batch: user 1 continues within gap (extends open session);
      // user 2 jumps past the gap (closes their first session)
      mem.addData((1L, 8000L * NS, 1.0), (2L, 99999L * NS, 1.0))
      q.processAllAvailable()
      val after = spark.table("sessions_out").as[EventStream.UserSession].collect()
      assert(after.length === 2)
      val u2 = after.find(_.user_id == 2L).get
      assert(u2.n_events === 1L && u2.total_value === 9.0)
    } finally q.stop()
  }
}
