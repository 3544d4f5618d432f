package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Funnel]]: per-user ordered-step
  * progression emitted as APPEND rows, one per depth transition.
  *
  * The batch funnel's earliest-completion greedy semantics depend on
  * seeing events in GLOBAL time order, which a stream does not deliver.
  * The discipline that restores exactness is the watermark: events are
  * BUFFERED in state until the event-time watermark passes them, then
  * folded through the step machine in timestamp order — at that point no
  * earlier event can still arrive (within the declared delay), so the
  * fold order equals the batch order. State per user is the completed
  * step times (tiny) plus the not-yet-ripe buffer, bounded by the
  * watermark delay x the user's event rate; an `EventTimeTimeout` at the
  * newest buffered timestamp drains the buffer when no further data
  * arrives. Events later than the declared watermark delay may fold out
  * of order — the standard lateness contract, same as any watermarked
  * operator.
  *
  * Batch inputs run the same fold in one invocation (prefer
  * [[graft.operators.Funnel.funnelDepth]] for batch — the cascaded
  * min-agg never buffers a user's history; this typed path exists for
  * streams and is batch-callable for parity testing).
  */
object FunnelStream {

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class FunnelState(stepTimes: Vector[Long], pending: List[(Long, String)],
                         lastSeen: Long = 0L)
  case class StepReached(user_id: Long, depth: Int, reached_at: Timestamp)

  /** @param stateTtlMs if set, a user whose newest event is older than
    *        this (event-time) is dropped from the state store — without
    *        it, per-user FunnelState lives forever and store size grows
    *        monotonically with user cardinality on a long-running stream.
    *        An expired user who returns restarts at depth 0. */
  def transitions(events: Dataset[Event], steps: Seq[String],
                  horizonMs: Option[Long] = None,
                  stateTtlMs: Option[Long] = None): Dataset[StepReached] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val stepsArr = steps.toArray
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StepReached](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          // earliest-completion greedy fold, events pre-sorted by (ts, type)
          def advance(times0: Vector[Long], evs: List[(Long, String)])
              : (Vector[Long], List[StepReached]) = {
            var times = times0
            val out = List.newBuilder[StepReached]
            evs.sorted.foreach { case (t, typ) =>
              val d = times.length
              if (d < stepsArr.length && typ == stepsArr(d) &&
                  (d == 0 || (t > times.last &&
                    horizonMs.forall(h => t <= times.last + h)))) {
                times = times :+ t
                out += StepReached(user, d + 1, new Timestamp(t))
              }
            }
            (times, out.result())
          }

          val st = state.getOption.getOrElse(FunnelState(Vector.empty, Nil))
          val incoming =
            if (state.hasTimedOut) Nil
            else it.map(e => (e.ts.getTime, e.event_type)).toList
          if (!streaming) {
            val (_, outs) = advance(st.stepTimes, st.pending ++ incoming)
            state.remove() // batch: state dies with the invocation
            outs.iterator
          } else {
            // fold everything the watermark has passed; re-arm the timeout
            // at the EARLIEST still-buffered event so each watermark
            // advance drains exactly the newly-ripe prefix (arming at the
            // newest would keep pushing the drain out as events arrive)
            val wm = state.getCurrentWatermarkMs()
            val all = st.pending ++ incoming
            val lastSeen = (st.lastSeen :: all.map(_._1)).max
            val (ripe, hold) = all.partition(_._1 <= wm)
            val (nt, outs) = advance(st.stepTimes, ripe)
            val expireAt = stateTtlMs.map(ttl => lastSeen + ttl)
            if (hold.isEmpty && expireAt.exists(_ <= wm)) {
              state.remove() // inactive past the TTL: free the store slot
            } else {
              state.update(FunnelState(nt, hold, lastSeen))
              if (hold.nonEmpty) state.setTimeoutTimestamp(hold.map(_._1).min)
              else expireAt.foreach(state.setTimeoutTimestamp)
              // (min(hold) and expireAt are both > wm here, as
              // EventTimeTimeout requires)
            }
            outs.iterator
          }
      }
  }

  /** Streaming entry point: applies the event-time watermark that the
    * buffer discipline and `EventTimeTimeout` require. */
  def transitionsStream(events: Dataset[Event], steps: Seq[String],
                        horizonMs: Option[Long] = None,
                        delay: String = "10 seconds",
                        stateTtlMs: Option[Long] = None)
      : Dataset[StepReached] = {
    import events.sparkSession.implicits._
    transitions(events.withWatermark("ts", delay).as[Event], steps, horizonMs,
      stateTtlMs)
  }
}
