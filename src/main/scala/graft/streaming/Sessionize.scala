package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful stream processing via flatMapGroupsWithState (SURVEY §2.10 /
  * the custom-state bullet of the streaming design): per-user session
  * windows with an inactivity gap.
  *
  * Two execution modes with one fold:
  *  - batch: the whole group arrives in one invocation and state is
  *    discarded afterwards, so the trailing open session is emitted with
  *    the closed ones (anything else would silently drop it);
  *  - streaming: only CLOSED sessions are emitted per micro-batch; the
  *    still-open session is kept in `state` and flushed when the event-time
  *    watermark passes its inactivity deadline (`EventTimeTimeout`), so a
  *    session spanning micro-batches is emitted once, merged — not split.
  *    Callers must set a watermark on `ts` first (see [[sessionizeStream]]).
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, event_type: String,
                   value: Double)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int, total_value: Double)

  private def toSession(user: Long, s: SessionState): Session =
    Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)

  /** Sessionize a (possibly unordered within group) event stream: events of
    * one user belong to the same session while gaps stay below `gapMs`.
    *
    * Batch inputs take the window plan ([[sessionizeBatch]]): the typed
    * fold would buffer one user's entire event history in a single group
    * invocation (`it.toSeq.sortBy`), which OOMs on a bot user with
    * millions of events; the lag/cumulative-sum pipeline is the same fold
    * expressed as window functions, where Spark sorts within partitions
    * with spill. Streams keep the flatMapGroupsWithState path — state
    * there is one OPEN session per user, O(1), and cross-micro-batch
    * merging genuinely needs it. Both paths implement the identical gap
    * rule, tie-ordered by (ts, event_type). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[Session] =
    if (events.isStreaming) sessionizeTyped(events, gapMs)
    else sessionizeBatch(events, gapMs)

  /** Batch plan: gap flag via lag, session id via running sum, one
    * hash-aggregate per (user, session). No per-group materialization —
    * the window sort spills, the aggregate is partial. */
  def sessionizeBatch(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("user_id").orderBy("ts", "event_type")
    val tms = unix_millis(col("ts"))
    events.toDF()
      .withColumn("brk",
        when(tms - lag(tms, 1).over(w) > gapMs, 1).otherwise(0))
      .withColumn("sid", sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        sum("value").as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
      .as[Session]
  }

  private def sessionizeTyped(events: Dataset[Event], gapMs: Long)
      : Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    // resolved at plan time on the driver and captured by the closure
    val streaming = events.isStreaming
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's inactivity deadline
            val out = state.getOption.toList.flatten.map(toSession(user, _))
            state.remove()
            out.iterator
          } else {
            // fold the delivered events in time order, seeded from any
            // prior open session kept across micro-batches
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionState]
            var cur: Option[SessionState] = state.getOption.flatMap(_.headOption)
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t - s.last <= gapMs =>
                  Some(SessionState(s.start, math.max(s.last, t), s.n + 1,
                    s.total + e.value))
                case Some(s) =>
                  closed += s
                  Some(SessionState(t, t, 1, e.value))
                case None => Some(SessionState(t, t, 1, e.value))
              }
            }
            cur match {
              case Some(s) if streaming =>
                val deadline = s.last + gapMs
                // late data can leave the deadline at or behind the current
                // watermark — setTimeoutTimestamp would throw, and no
                // in-gap event can arrive anyway, so close immediately
                if (deadline <= state.getCurrentWatermarkMs()) {
                  closed += s
                  state.remove()
                } else {
                  // hold the open session; flush once the watermark proves
                  // no in-gap event can still arrive
                  state.update(List(s))
                  state.setTimeoutTimestamp(deadline)
                }
              case Some(s) =>
                closed += s // batch: state dies with the invocation — emit
                state.remove()
              case None =>
                state.remove()
            }
            closed.iterator.map(toSession(user, _))
          }
      }
  }

  /** Streaming entry point: applies the event-time watermark that
    * `EventTimeTimeout` requires, then sessionizes. `delay` bounds how late
    * an event may arrive and still join its session. */
  def sessionizeStream(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                       delay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    sessionize(events.withWatermark("ts", delay).as[Event], gapMs)
  }
}
