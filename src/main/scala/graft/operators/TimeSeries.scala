package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: turn per-key event aggregates into a DENSE
  * fixed-step series (every bucket present between each key's first and
  * last observation) with forward-filled values — the resample/gap-fill
  * step most downstream time-series consumers (charting, windowed models,
  * anomaly baselines) assume has already happened.
  *
  * Scale shape: the grid is generated per key with `sequence` + `explode`
  * (map-side fan-out bounded by each key's time span / step — no
  * cross-join against a global calendar), joined back on (key, bucket),
  * and forward-fill is one `last(ignoreNulls)` running window per key —
  * a single shuffle on the key, sort-with-spill within partitions.
  */
object TimeSeries {

  /** @param stepSeconds bucket width; observations must already be
    *                    bucket-aligned (pre-truncate with date_trunc)
    * @return (keyCol, bucket, value, was_gap) — `value` forward-filled
    *         from the last non-null observation, null until the key's
    *         first one; `was_gap` = 1 where the bucket had NO observation
    *         row (an observed-but-null value keeps was_gap = 0 — presence
    *         is tracked with a marker column, not value nullness — and is
    *         carried over by the fill like a gap is). */
  def gapFill(observations: DataFrame, keyCol: String, bucketCol: String,
              valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "step must be positive")
    val spans = observations.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("h0"), max(col(bucketCol)).as("h1"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("h0"), col("h1"),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as(bucketCol))
    val w = Window.partitionBy(keyCol).orderBy(bucketCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observations.withColumn("__observed", lit(1)),
        Seq(keyCol, bucketCol), "left")
      .select(col(keyCol), col(bucketCol),
        last(col(valueCol), ignoreNulls = true).over(w).as(valueCol),
        when(col("__observed").isNull, 1).otherwise(0).as("was_gap"))
  }
}
