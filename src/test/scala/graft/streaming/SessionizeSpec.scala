package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import Sessionize._

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState splits sessions at the inactivity gap") {
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), "click", 1.0),
      Event(1, ts("2024-01-01 10:10:00"), "view", 2.0),
      Event(1, ts("2024-01-01 11:30:00"), "click", 3.0), // > 30 min gap
      Event(2, ts("2024-01-01 10:05:00"), "view", 5.0)
    ).toDS()
    val out = sessionize(events, gapMs = 30 * 60 * 1000L).collect()
      .map(s => (s.user_id, s.session_start.toString, s.n_events, s.total_value))
      .toSet
    assert(out == Set(
      (1L, "2024-01-01 10:00:00.0", 2, 3.0),
      (1L, "2024-01-01 11:30:00.0", 1, 3.0),
      (2L, "2024-01-01 10:05:00.0", 1, 5.0)))
  }

  test("streaming: a session spanning two micro-batches is emitted once, " +
    "merged, on event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = sessionizeStream(input.toDS(), gapMs = 30 * 60 * 1000L,
      delay = "0 seconds")
    val query = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 opens a session — held in state, nothing emitted
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), "a", 1.0),
        Event(1, ts("2024-01-01 10:10:00"), "b", 2.0))
      query.processAllAvailable()
      assert(spark.table("sess_out").count() == 0,
        "open session must stay in state, not be emitted split")
      // batch 2: user 1 continues within the gap (must merge with the held
      // state); user 2's event advances the watermark past user 1's
      // inactivity deadline (10:20 + 30 min = 10:50)
      input.addData(
        Event(1, ts("2024-01-01 10:20:00"), "c", 4.0),
        Event(2, ts("2024-01-01 11:30:00"), "x", 9.0))
      query.processAllAvailable()
      // batch 3: watermark (11:30) now exceeds the deadline — timeout fires
      input.addData(Event(2, ts("2024-01-01 11:40:00"), "y", 1.0))
      query.processAllAvailable()
      val u1 = spark.table("sess_out").as[Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.session_start.toString, s.session_end.toString,
          s.n_events, s.total_value)).toSeq
      assert(u1 == Seq(("2024-01-01 10:00:00.0", "2024-01-01 10:20:00.0",
        3, 7.0)), s"expected ONE merged session, got $u1")
    } finally query.stop()
  }

  test("batch path plans as window functions, not per-group state") {
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), "click", 1.0),
      Event(1, ts("2024-01-01 11:30:00"), "view", 2.0)
    ).toDS()
    val sessions = sessionize(events, gapMs = 30 * 60 * 1000L)
    val plan = sessions.queryExecution.executedPlan.toString
    // the batch plan must be the spill-safe window pipeline — a
    // FlatMapGroupsWithState here means one user's whole history is being
    // buffered in a single group invocation
    assert(!plan.contains("FlatMapGroupsWithState"), plan.take(2000))
    assert(plan.contains("Window"), plan.take(2000))
    // and the two paths agree on the fold semantics
    val out = sessions.collect().map(s =>
      (s.user_id, s.session_start.toString, s.n_events, s.total_value)).toSet
    assert(out == Set(
      (1L, "2024-01-01 10:00:00.0", 1, 1.0),
      (1L, "2024-01-01 11:30:00.0", 1, 2.0)))
  }

  test("sessionization over the events table produces per-user sessions") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .selectExpr("user_id", "ts", "event_type", "value").as[Event]
    val sessions = sessionize(events, gapMs = 60 * 60 * 1000L)
    val n = sessions.count()
    assert(n > 0)
    // every session is internally consistent
    assert(sessions.where("session_end < session_start").count() == 0)
    assert(sessions.where("n_events < 1").count() == 0)
  }
}
