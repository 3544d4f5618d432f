package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Funnel
import FunnelStream._

class FunnelStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val steps = Seq("view", "click", "purchase")

  private val fixture = Seq(
    Event(1, ts("2024-01-01 10:00:00"), "view"),
    Event(1, ts("2024-01-01 10:00:05"), "click"),
    Event(1, ts("2024-01-01 10:00:09"), "purchase"),
    Event(2, ts("2024-01-01 10:00:02"), "click"),    // before first view
    Event(2, ts("2024-01-01 10:00:04"), "view"),
    Event(3, ts("2024-01-01 10:00:01"), "view"),
    Event(3, ts("2024-01-01 10:00:01"), "click"))    // simultaneous: no

  test("batch transitions agree with the cascaded-min funnelDepth") {
    val trans = transitions(fixture.toDS(), steps).collect()
      .map(t => (t.user_id, t.depth, t.reached_at.toString)).toSet
    assert(trans == Set(
      (1L, 1, "2024-01-01 10:00:00.0"),
      (1L, 2, "2024-01-01 10:00:05.0"),
      (1L, 3, "2024-01-01 10:00:09.0"),
      (2L, 1, "2024-01-01 10:00:04.0"),
      (3L, 1, "2024-01-01 10:00:01.0")))
    // max transition depth per user == batch funnelDepth (0-depth users
    // simply have no transitions)
    val fromTrans = trans.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val depths = Funnel.funnelDepth(
        fixture.toDF("user_id", "ts", "event_type"),
        "user_id", "event_type", "ts", steps)
      .as[(Long, Int)].collect().toMap
    assert(depths.filter(_._2 > 0) == fromTrans)
  }

  test("streaming: out-of-order events within the delay fold exactly; " +
    "the buffer drains on event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = transitionsStream(input.toDS(), steps, delay = "10 seconds")
    val query = out.writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // batch 1: click arrives BEFORE its view (out of order within the
      // 10 s delay) — nothing ripe yet (watermark still behind them)
      input.addData(
        Event(7, ts("2024-01-01 10:00:05"), "click"),
        Event(7, ts("2024-01-01 10:00:02"), "view"))
      query.processAllAvailable()
      // batch 2: a much later event advances the watermark past batch 1,
      // so view->click fold in TIME order (view first despite arrival)
      input.addData(Event(7, ts("2024-01-01 10:05:00"), "purchase"))
      query.processAllAvailable()
      val mid = spark.table("funnel_out").as[StepReached].collect()
        .map(t => (t.depth, t.reached_at.toString)).toSet
      assert(mid == Set((1, "2024-01-01 10:00:02.0"),
        (2, "2024-01-01 10:00:05.0")),
        s"got $mid")
      // batch 3: advance the watermark past the purchase so its buffer
      // entry ripens (event-time timeout drains it) -> depth 3
      input.addData(Event(8, ts("2024-01-01 10:10:00"), "view"))
      query.processAllAvailable()
      val fin = spark.table("funnel_out").as[StepReached].collect()
        .map(t => (t.user_id, t.depth)).toSet
      assert(fin.contains((7L, 3)), s"purchase never drained: $fin")
    } finally query.stop()
  }

  test("state TTL expires inactive users so a returning user restarts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // 60 s inactivity TTL; without it the late click would reach depth 2
    val out = transitionsStream(input.toDS(), Seq("view", "click"),
      delay = "10 seconds", stateTtlMs = Some(60000L))
    val query = out.writeStream.format("memory").queryName("funnel_ttl")
      .outputMode("append").start()
    try {
      input.addData(Event(9, ts("2024-01-01 10:00:00"), "view"))
      // another user's traffic advances the watermark far past the TTL,
      // firing user 9's expiry timer
      input.addData(Event(99, ts("2024-01-01 10:30:00"), "view"))
      query.processAllAvailable()
      // user 9 returns with a click: state is gone, so it does NOT extend
      // the old view to depth 2
      input.addData(Event(9, ts("2024-01-01 10:31:00"), "click"))
      input.addData(Event(99, ts("2024-01-01 10:45:00"), "view"))
      query.processAllAvailable()
      // and a fresh view restarts the funnel at depth 1
      input.addData(Event(9, ts("2024-01-01 10:46:00"), "view"))
      input.addData(Event(99, ts("2024-01-01 11:30:00"), "view"))
      query.processAllAvailable()
      val got = spark.table("funnel_ttl").as[StepReached].collect()
        .filter(_.user_id == 9L)
        .map(t => (t.depth, t.reached_at.toString)).toSet
      assert(got == Set(
        (1, "2024-01-01 10:00:00.0"),
        (1, "2024-01-01 10:46:00.0")), s"got $got")
    } finally query.stop()
  }
}
