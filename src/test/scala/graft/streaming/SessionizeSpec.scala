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
