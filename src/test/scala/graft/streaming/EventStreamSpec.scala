package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

class EventStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("windowed counts over a MemoryStream match the batch equivalent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = Seq(
      Ev(Timestamp.valueOf("2024-01-01 00:10:00"), 1, "click", 1.0),
      Ev(Timestamp.valueOf("2024-01-01 00:40:00"), 2, "click", 2.0),
      Ev(Timestamp.valueOf("2024-01-01 01:05:00"), 1, "view", 3.0),
      Ev(Timestamp.valueOf("2024-01-01 01:15:00"), 3, "click", 4.0)
    )
    mem.addData(events: _*)
    val q = EventStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("win_out")
      .select("win_start", "event_type", "n_events", "total_value")
      .as[(Long, String, Long, Double)].collect().toSet
    val h0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    val h1 = Timestamp.valueOf("2024-01-01 01:00:00").getTime / 1000
    assert(got == Set(
      (h0, "click", 2L, 3.0), (h1, "view", 1L, 3.0), (h1, "click", 1L, 4.0)))
    // batch equivalent over the same rows gives the same aggregation
    val batch = EventStream.windowedCounts(events.toDF())
      .as[(Long, String, Long, Double)].collect().toSet
    assert(batch == got)
  }
}
