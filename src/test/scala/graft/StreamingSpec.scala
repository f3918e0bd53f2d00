package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Structured Streaming behavior: watermarked windowed aggregation via
  * MemoryStream, and the stream/batch-unified transforms in batch mode.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("windowed counts over a MemoryStream emit per-window totals") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0))
    val q = EventStreams.windowedCounts(mem.toDF(), "1 hour", "1 hour")
      .writeStream.format("memory").queryName("wc").outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select(col("event_type"), col("n"), col("total")).collect()
      assert(rows.length == 2)
      val click = rows.find(_.getString(0) == "click").get
      assert(click.getLong(1) == 2 && click.getDouble(2) == 3.0)
    } finally q.stop()
  }

  test("sessionize splits on >30min gaps (batch-mode execution)") {
    val events = Seq(
      Event(1, ts(0), 7, "a", 0), Event(2, ts(10), 7, "a", 0),
      Event(3, ts(50), 7, "a", 0), // 40-min gap -> closes session 0
      Event(4, ts(55), 7, "a", 0)).toDS()
    val out = EventStreams.sessionize(events).collect()
    assert(out.length == 1) // one closed session (the open one stays in state)
    assert(out.head.session_id == 0 && out.head.n_events == 2)
  }

  test("dedupStream drops duplicate keys within the watermark horizon") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(1), 1, "click", 1.0), // same event_id -> dropped
      Event(2, ts(2), 1, "view", 2.0),
      Event(2, ts(3), 1, "view", 2.0),  // dropped
      Event(3, ts(4), 2, "click", 3.0))
    val q = EventStreams.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dd").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val ids = spark.table("dd").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), ids.mkString(","))
    } finally q.stop()
  }

  test("readEvents wires a file stream with the batch schema") {
    val df = EventStreams.readEvents(spark, s"$sfDir/events.parquet")
    assert(df.isStreaming)
    assert(df.schema.fieldNames.contains("event_type"))
  }
}
