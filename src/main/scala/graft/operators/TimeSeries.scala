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

  /** Classic ADDITIVE seasonal-trend decomposition (the moving-average
    * method every stats package calls "naive"/"classical"): v = trend +
    * seasonal + residual over a REGULAR series (run [[gapFill]] /
    * [[interpolate]] first — ROWS-frame windows assume one row per
    * bucket).
    *
    *  - trend: the standard centered 2xm moving average for even period
    *    m — full-window sum with HALF weight on both endpoints,
    *    `(sum[-m/2..m/2] - (lag(m/2) + lead(m/2)) / 2) / m` — null until
    *    a full window exists on both sides (lag/lead null propagates,
    *    which IS the contract);
    *  - seasonal: per-(key, phase) mean of the detrended values, centered
    *    by subtracting the key's grand mean of phase means so the
    *    components sum back to v up to residual; phase = bucket seconds /
    *    step mod period — a pure expression, no row numbering;
    *  - residual: v - trend - seasonal where trend exists.
    *
    * Shuffles: ONE per-key window sort (bounded ROWS frames only), one
    * (key, phase) partial agg + a phase-keyed join-back, one key-sized
    * grand-mean broadcast join. Outputs floor-quantized at 1e-4 (the
    * engines' window sums agree term-for-term; quantization guards the
    * decimal-midpoint rounding divergence).
    *
    * @param period seasonal cycle length in buckets (even, e.g. 24 for
    *               hour-of-day on an hourly series) */
  def seasonalDecompose(series: DataFrame, keyCol: String, bucketCol: String,
                        valueCol: String, stepSeconds: Long,
                        period: Int, valueScale: Int = 2): DataFrame = {
    require(period >= 2 && period % 2 == 0, "period must be even and >= 2")
    require(stepSeconds > 0, "step must be positive")
    require(valueScale >= 0 && valueScale <= 6, "valueScale in [0, 6]")
    val half = period / 2
    // exact-integer arithmetic end to end: values lift to 10^scale units
    // (the input contract: values quantized to `valueScale` decimals),
    // window sums / phase sums run over LONGS (associativity holds, so
    // engines cannot disagree by sum order), and every double is born
    // from ONE division of exact integers — the quantized outputs are
    // then bit-identical across engines by construction
    val unit = math.pow(10, valueScale).toLong
    val w = Window.partitionBy(keyCol).orderBy(bucketCol)
    val vc = floor(col(valueCol).cast("double") * unit + 0.5).cast("long")
    val trended = series
      .withColumn("__phase",
        pmod(floor(unix_timestamp(col(bucketCol)) / stepSeconds),
          lit(period.toLong)))
      .withColumn("__vc", vc)
      // centered 2xm MA numerator in integer units, x2 to keep the
      // half-weight endpoints integral: null until a full window
      .withColumn("__tc",
        sum(col("__vc") * 2).over(w.rowsBetween(-half, half)) -
          lag(col("__vc"), half).over(w) - lead(col("__vc"), half).over(w))
    val trendDen = lit(2.0 * period * unit)
    // per-(key, phase) detrended mean: numerator exact in integer units
    // (v - trend = (2*period*vc - tc) / (2*period*unit))
    val seas = trended.where(col("__tc").isNotNull)
      .groupBy(col(keyCol), col("__phase"))
      .agg((sum(col("__vc") * (2 * period) - col("__tc")).cast("double") /
        (trendDen * count(lit(1)))).as("__sraw"))
    // grand mean over the phase means: an ORDERED fold over the (at most
    // `period`) phase-sorted values — the one unavoidable double sum,
    // made order-deterministic so both engines fold identically
    val grand = seas.groupBy(col(keyCol))
      .agg(collect_list(struct(col("__phase"), col("__sraw"))).as("__ps"))
      .select(col(keyCol),
        (aggregate(array_sort(col("__ps")), lit(0.0),
          (acc, e) => acc + e.getField("__sraw")) /
          size(col("__ps"))).as("__smean"))
    def q(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e4) + lit(0.5)) / lit(1e4) + lit(0.0)
    trended
      .join(seas, Seq(keyCol, "__phase"), "left")
      .join(broadcast(grand), Seq(keyCol), "left")
      .select(col(keyCol), col(bucketCol), col(valueCol),
        q(col("__tc").cast("double") / trendDen).as("trend"),
        q(col("__sraw") - col("__smean")).as("seasonal"),
        q(col("__vc").cast("double") / unit -
          col("__tc").cast("double") / trendDen -
          (col("__sraw") - col("__smean"))).as("resid"))
  }

  /** Rolling robust anomaly detection: per key, each observation is judged
    * against the MEDIAN and MAD of its trailing `window` observations
    * (current row included) — the Hampel-filter test, |x - med| >
    * nSigma * 1.4826 * MAD, which a single spike cannot poison the way it
    * poisons a rolling mean/stddev z-score (the a7 shape).
    *
    * Scale shape: one shuffle on the key, then a bounded ROWS window
    * (`window` is tens, so each row's collected buffer is tiny and
    * spill-safe); median and MAD are array expressions over that buffer —
    * no second pass, no self-join. The buffer array is projected to a
    * column before any indexing (the HOF-indexing trap in SCALE.md).
    *
    * Degenerate window (MAD = 0, i.e. a constant baseline): the z-score is
    * undefined (null) and a value off the constant is flagged directly —
    * a spike on a flat line is the clearest anomaly there is.
    *
    * @param window trailing row count, odd so the median is an element
    * @return (key, order, value, med, mad, robust_z, anomaly) — med/mad/z
    *         null and anomaly 0 until a key has `window` rows; robust_z
    *         quantized to 1e-4 */
  def rollingRobustAnomaly(df: DataFrame, keyCol: String, orderCol: String,
                           valueCol: String, window: Int = 21,
                           nSigma: Double = 3.0): DataFrame = {
    require(window > 0 && window % 2 == 1, s"window must be odd, got $window")
    val mid = (window + 1) / 2
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-(window - 1), Window.currentRow)
    val x = col(valueCol).cast("double")
    df.select(col(keyCol), col(orderCol), col(valueCol))
      .withColumn("__buf", collect_list(x).over(w))
      .withColumn("__full", size(col("__buf")) === window)
      .withColumn("med",
        when(col("__full"), element_at(array_sort(col("__buf")), mid)))
      .withColumn("mad",
        when(col("__full"), element_at(array_sort(
          transform(col("__buf"), v => abs(v - col("med")))), mid)))
      .withColumn("robust_z",
        when(col("__full") && col("mad") > 0,
          floor(abs(x - col("med")) / (lit(1.4826) * col("mad")) *
            lit(1e4) + lit(0.5)) / lit(1e4)))
      .withColumn("anomaly",
        when(!col("__full"), 0)
          .when(col("mad") > 0,
            when(abs(x - col("med")) >
              lit(1.4826) * col("mad") * lit(nSigma), 1).otherwise(0))
          .otherwise(when(x =!= col("med"), 1).otherwise(0)))
      .drop("__buf", "__full")
  }

  /** Tabular CUSUM change-point detection per key (Page 1954): alarms
    * when the cumulative deviation from the series mean exceeds
    * `hSigmas`·σ in either direction, with the usual slack
    * κ = `kappaSigmas`·σ absorbing in-control noise. Detects sustained
    * LEVEL SHIFTS the pointwise Hampel filter ([[rollingRobustAnomaly]])
    * ignores — the two are complements (spike vs drift).
    *
    * Scale shape — no sequential recurrence: the textbook
    * S⁺_t = max(0, S⁺_{t-1} + dev_t) fold equals the DRAWDOWN identity
    * S⁺_t = P_t − min(0, min_{i≤t} P_i) over the deviation prefix sums
    * (induction in one line: max(0, P_t − m_{t-1}) = P_t − min(P_t,
    * m_{t-1})), so the whole operator is one keyed shuffle carrying two
    * running-prefix windows (sum, then min) — spill-safe at any series
    * length, never a per-key collect. Reference stats (μ, σ) come from
    * the full per-key series; σ = 0 (constant series) alarms nothing.
    *
    * Output: (keyCol, orderCol, valueCol, s_pos, s_neg, alarm) with the
    * statistics quantized to 1e-4 and the alarm decided on the
    * UNquantized values. */
  def cusum(df: DataFrame, keyCol: String, orderCol: String,
            valueCol: String, kappaSigmas: Double = 0.5,
            hSigmas: Double = 4.0): DataFrame = {
    val x = col(valueCol).cast("double")
    val stats = df.groupBy(keyCol).agg(
      avg(x).as("__mu"),
      coalesce(stddev_samp(x), lit(0.0)).as("__sigma"))
    val run = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q4(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e4) + lit(0.5)) / lit(1e4)
    df.join(stats, keyCol)
      .withColumn("__pp",
        sum(x - col("__mu") - lit(kappaSigmas) * col("__sigma")).over(run))
      .withColumn("__pn",
        sum(col("__mu") - lit(kappaSigmas) * col("__sigma") - x).over(run))
      .withColumn("__sp", col("__pp") - least(min(col("__pp")).over(run),
        lit(0.0)))
      .withColumn("__sn", col("__pn") - least(min(col("__pn")).over(run),
        lit(0.0)))
      .select(col(keyCol), col(orderCol), col(valueCol),
        q4(col("__sp")).as("s_pos"), q4(col("__sn")).as("s_neg"),
        when(col("__sp") > lit(hSigmas) * col("__sigma") ||
          col("__sn") > lit(hSigmas) * col("__sigma"), 1).otherwise(0)
          .as("alarm"))
  }

  /** Dominant-period detection by sample autocorrelation — the question
    * [[seasonalDecompose]] makes you answer by hand ("period = 24?"),
    * answered from the data: per key, the lag L in [minLag, maxLag]
    * maximizing ACF(L) = Σ(x_t−μ)(x_{t+L}−μ) / Σ(x_t−μ)².
    *
    * Scale shape: pairs come from ONE expression-equi-join (b.idx =
    * a.idx + L with L exploded on the probe side — never a range or
    * theta join), so the shuffle is rows × (maxLag−minLag+1) with
    * bounded fan-out; per-(key, lag) and per-key moment frames are
    * group-sized; the argmax is a max-of-struct aggregate, no window.
    *
    * Cross-engine parity by the seasonalDecompose discipline: values
    * lift to 10^valueScale integer units, so every moment sum (Σx,
    * Σx², Σ x_t·x_{t+L}, boundary sums) is an exact long and each ACF
    * is born from one fixed-order double expression of exact integers —
    * numerator via the demeaning identity
    * Σ(x_t−μ)(x_{t+L}−μ) = S_xy − μ·(S_a+S_b) + n_L·μ², denominator
    * S_xx − 2μS + nμ² — then quantized to 1e-6. Keys with zero
    * variance (den = 0) emit no row.
    *
    * @param series REGULAR series (gap-filled; `bucketCol` timestamps
    *               stepSeconds apart)
    * @return (keyCol, period: int, acf: double, n: long) */
  def acfDominantPeriod(series: DataFrame, keyCol: String,
                        bucketCol: String, valueCol: String,
                        stepSeconds: Long, minLag: Int, maxLag: Int,
                        valueScale: Int = 2): DataFrame = {
    require(minLag >= 1 && maxLag >= minLag, "need 1 <= minLag <= maxLag")
    require(stepSeconds > 0, "step must be positive")
    require(valueScale >= 0 && valueScale <= 6, "valueScale in [0, 6]")
    val unit = math.pow(10, valueScale).toLong
    val d = series.select(col(keyCol).as("k"),
      floor(unix_timestamp(col(bucketCol)) / stepSeconds).cast("long")
        .as("i"),
      floor(col(valueCol).cast("double") * unit + 0.5).cast("long")
        .as("x"))
    val keyM = d.groupBy("k").agg(
      sum("x").as("s"), count(lit(1)).as("n"),
      sum(col("x") * col("x")).as("sxx"))
    val lagged = d
      .withColumn("L",
        explode(sequence(lit(minLag.toLong), lit(maxLag.toLong))))
      .alias("a")
      .join(d.alias("b"),
        col("a.k") === col("b.k") && col("b.i") === col("a.i") + col("L"))
      .groupBy(col("a.k").as("k"), col("L"))
      .agg(sum(col("a.x") * col("b.x")).as("sxy"),
        sum(col("a.x")).as("sa"), sum(col("b.x")).as("sb"),
        count(lit(1)).as("nl"))
    val mu = col("s").cast("double") / col("n")
    val num = col("sxy") - mu * (col("sa") + col("sb")) +
      col("nl") * mu * mu
    val den = col("sxx") - lit(2.0) * mu * col("s") + col("n") * mu * mu
    val acfq = floor(num / den * 1e6 + 0.5) / 1e6
    lagged.join(keyM, "k")
      .where(den > 0)
      .groupBy(col("k"))
      .agg(max(struct(acfq.as("a"), (-col("L")).as("negl"),
        col("n").as("n"))).as("m"))
      .select(col("k").as(keyCol),
        (-col("m.negl")).cast("int").as("period"),
        (col("m.a") + 0.0).as("acf"), col("m.n").as("n"))
  }
}
