package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful stream processing via flatMapGroupsWithState (SURVEY §2.10 /
  * the custom-state bullet of the streaming design): per-user session
  * windows with an inactivity gap. Works identically on batch Datasets
  * (state machinery degenerates to a per-group fold), which is how the
  * deterministic spec pins it; the streaming path is exercised with
  * MemoryStream + event-time timeout.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, event_type: String,
                   value: Double)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int, total_value: Double)

  /** Sessionize a (possibly unordered within group) event stream: events of
    * one user belong to the same session while gaps stay below `gapMs`.
    * Sessions are closed and emitted at the end of each delivered group
    * (batch: the whole group; streaming: the micro-batch, with prior open
    * state folded in first). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          // batch execution delivers the whole group once: fold in time order
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
          val sessions = scala.collection.mutable.ArrayBuffer.empty[SessionState]
          var cur: Option[SessionState] = state.getOption.flatMap(_.headOption)
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur = cur match {
              case Some(s) if t - s.last <= gapMs =>
                Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
              case Some(s) =>
                sessions += s
                Some(SessionState(t, t, 1, e.value))
              case None => Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(sessions += _)
          state.remove()
          sessions.iterator.map(s => Session(user, new Timestamp(s.start),
            new Timestamp(s.last), s.n, s.total))
      }
  }
}
