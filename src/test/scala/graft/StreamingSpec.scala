package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed counts match the batch aggregation") {
    // stream the sf0.001 events parquet as a finite file source
    val dir = java.nio.file.Files.createTempDirectory("events").toString
    // copy the single parquet file into a directory-shaped source
    val src = java.nio.file.Paths.get(TestSpark.sfDir, "events.parquet")
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(dir, "events.parquet"))

    val stream = EventStream.readEvents(spark, dir)
    assert(stream.isStreaming)
    val q = EventStream.runToMemory(
      EventStream.windowedCounts(stream, "1 hour", "2 hours"), "stream_counts")
    try {
      val streamed = spark.table("stream_counts")
        .select(col("window.start").as("hour"), col("event_type"), col("n_events"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap

      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batch = spark.read.parquet(s"$dir/events.parquet")
        .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
        .groupBy(date_trunc("hour", col("event_time")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap

      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming upsert sink applies latest-wins merges across batches") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sink").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val q = EventStream.upsertSink(
      mem.toDF().toDF("id", "content", "v"), root, "docs", "id", "v")
    try {
      mem.addData((1L, "a", 1L), (2L, "b", 1L))
      q.processAllAvailable()
      mem.addData((1L, "a2", 2L), (3L, "c", 1L))
      q.processAllAvailable()
      val out = spark.read.parquet(graft.sources.CollectionStore.path(root, "docs"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out === Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    } finally q.stop()
  }
}
