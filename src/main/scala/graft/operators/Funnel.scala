package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log: how far does each user get
  * through `steps`, where step i+1 must happen STRICTLY AFTER the
  * earliest valid completion of step i (the standard conversion-funnel
  * semantics — earliest-completion greedy matching).
  *
  * Shape chosen for scale: one cascaded min-aggregation per step —
  * `filter(type = step) ⋈ previous per-user step times → groupBy(user)
  * min(ts)` — so every stage is a partial-aggregatable shuffle on the
  * user key over the (small) single-type event slice, and no per-user
  * event list is ever materialized (a collect_list state machine would
  * hold a hot user's whole history in one task; this holds one timestamp
  * per user per step). k steps = k bounded shuffles, each smaller than
  * the last.
  */
object Funnel {

  /** @param horizonSeconds if set, step i+1 must also happen within this
    *        many seconds AFTER step i's completion (the usual product-
    *        funnel conversion window); unset = any later time counts.
    *        For timestamp/date `tsCol` the bound is a calendar interval;
    *        for a NUMERIC `tsCol` it is added in the column's own unit —
    *        pass epoch-seconds values with an epoch-seconds column.
    *        (The streaming twin, FunnelStream, takes `horizonMs` in
    *        MILLISECONDS because its state timers are epoch-millis —
    *        convert when writing batch/stream parity tests.)
    * @return (userCol, depth) — depth in [0, steps.size]: the length of
    *         the longest prefix of `steps` completed in order. Users
    *         present in `events` but never reaching step 1 have depth 0. */
  def funnelDepth(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String],
                  horizonSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import org.apache.spark.sql.types._
    // only forced when a horizon is set — orderable non-numeric ts
    // columns stay usable for the unbounded funnel
    lazy val tsIsTemporal = events.schema(tsCol).dataType match {
      case TimestampType | TimestampNTZType | DateType => true
      case _: NumericType => false
      case other => throw new IllegalArgumentException(
        s"tsCol must be temporal or numeric, got $other")
    }
    val stepTimes = steps.zipWithIndex
      .foldLeft(Vector.empty[DataFrame]) { case (acc, (step, i)) =>
        val slice = events.where(col(typeCol) === step)
          .select(col(userCol), col(tsCol))
        val cur = acc.lastOption match {
          case None =>
            slice.groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
          case Some(prev) =>
            val after = col(tsCol) > col(s"t${i - 1}")
            val within = horizonSeconds.fold(lit(true))(h =>
              if (tsIsTemporal)
                col(tsCol) <= col(s"t${i - 1}") + expr(s"INTERVAL $h SECONDS")
              else col(tsCol) <= col(s"t${i - 1}") + lit(h))
            slice.join(prev, Seq(userCol))
              .where(after && within)
              .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
        }
        acc :+ cur.select(col(userCol), col(s"t$i"))
      }
    val users = events.select(col(userCol)).distinct()
    val joined = stepTimes.foldLeft(users)((df, st) =>
      df.join(st, Seq(userCol), "left"))
    // t_i non-null implies t_{i-1} non-null, so the sum IS the prefix length
    joined.select(col(userCol),
      steps.indices.map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
        .reduce(_ + _).as("depth"))
  }
}
