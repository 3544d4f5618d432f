package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingestion path (SURVEY §2.10) — a capability
  * extension over the batch engine: file-source readStream over the same
  * parquet layout, watermarked tumbling-window aggregation, partitioned
  * sink. The batch query `st_window_agg` in SparkEntry computes the same
  * aggregation shape for oracle checking; this module is exercised by
  * StreamingSpec via MemoryStream.
  */
object EventStream {

  /** Watermarked 1-hour tumbling window aggregation over an event stream
    * with schema (ts timestamp, user_id long, event_type string,
    * value double). Works for both batch and streaming DataFrames. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Watermarked OHLC resampling bars: per (event_type, 1-hour window)
    * open/high/low/close/volume where open/close are value-at-argmin/
    * argmax over (ts, value) — the same one-pass min/max(struct)
    * partial-agg shape as the batch `ts_ohlc_bars` query, and because
    * struct min/max are plain aggregates it streams under a watermark
    * exactly like [[windowedCounts]] (no per-window sort, no arbitrary
    * state). Works on batch frames too for result-parity testing. */
  def ohlcBars(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(min(struct(col("ts"), col("value"))).as("mo"),
        max(struct(col("ts"), col("value"))).as("mc"),
        max("value").as("high"), min("value").as("low"),
        count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("mo.value").as("open"),
        col("mc.value").as("close"), col("high"), col("low"), col("n"))

  /** Streaming exactly-once-per-key dedup: drops re-deliveries of the same
    * key arriving within the watermark delay of each other — the streaming
    * counterpart of exact dedup in a training-data ingest path (at-least-
    * once sources re-deliver; state is bounded by the watermark, unlike a
    * plain dropDuplicates whose state grows forever). Batch frames fall
    * back to plain dropDuplicates. */
  def dedupedEvents(events: DataFrame, keys: Seq[String],
                    delay: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  /** Stream-stream interval self-join: each purchase event pairs with the
    * same user's click events from the trailing attribution window — the
    * streaming counterpart of the batch `RangeJoin` query (j13). Both
    * sides carry event-time watermarks, and the join condition bounds
    * click time against purchase time from BOTH directions, so Spark can
    * compute a state eviction horizon for each side instead of buffering
    * the streams forever (the state-cleanup contract of stream-stream
    * joins). Works on batch frames too (plain interval join) for
    * result-parity testing. */
  def attributedPurchases(events: DataFrame,
                          window: String = "30 minutes",
                          delay: String = "1 hour"): DataFrame = {
    val purchases = {
      val p = events.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("value").as("p_value"))
      if (p.isStreaming) p.withWatermark("p_ts", delay) else p
    }
    val clicks = {
      val c = events.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      if (c.isStreaming) c.withWatermark("c_ts", delay) else c
    }
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
          col("c_ts") <= col("p_ts"))
      .select(col("user_id"), unix_timestamp(col("p_ts")).as("p_s"),
        unix_timestamp(col("c_ts")).as("c_s"), col("p_value"))
  }

  /** LEFT-OUTER stream-stream interval join: like [[attributedPurchases]]
    * but purchases with NO click in the attribution window still emit,
    * with null click columns — in streaming mode Spark holds the
    * unmatched purchase until the watermark proves no matching click can
    * still arrive, then emits the null-padded row (the outer-join state
    * eviction contract). Batch frames take the plain left interval join,
    * which is what the oracle checks. */
  def attributedPurchasesOuter(events: DataFrame,
                               window: String = "30 minutes",
                               delay: String = "1 hour"): DataFrame = {
    val purchases = {
      val p = events.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("value").as("p_value"))
      if (p.isStreaming) p.withWatermark("p_ts", delay) else p
    }
    val clicks = {
      val c = events.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      if (c.isStreaming) c.withWatermark("c_ts", delay) else c
    }
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
      .select(col("user_id"), unix_timestamp(col("p_ts")).as("p_s"),
        unix_timestamp(col("c_ts")).as("c_s"), col("p_value"))
  }

  /** Watermarked per-window HLL register build — approximate distinct
    * users per (1-hour window, event_type) as a STREAM. The streaming
    * state is the register table itself: at most m = 2^p (window, type,
    * register) rows per group regardless of traffic, max-merged
    * incrementally by the ordinary streaming aggregation machinery (max
    * is the HLL merge operator, so micro-batch boundaries cannot change
    * the result — SketchSpec pins that identity for the batch builder).
    * Emit the registers, not the estimate: registers stay mergeable
    * downstream (across streams, days, or re-partitioned sinks), and the
    * scalar fold is [[hllWindowEstimate]] at read time. This is the
    * production continuous-distinct shape: per-window sketch state in
    * the sink, never a per-user set. Works on batch frames too for
    * result-parity testing. */
  def hllRegisterStream(events: DataFrame, p: Int = 12): DataFrame = {
    val (idx, rho) = graft.operators.Sketches.hllRegister(
      col("user_id").cast("string"), p)
    events
      .withWatermark("ts", "2 hours")
      .withColumn("hll_idx", idx)
      .withColumn("hll_rho", rho)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"),
        col("hll_idx"))
      .agg(max("hll_rho").as("mj"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("hll_idx"), col("mj"))
  }

  /** Fold a (win_start, event_type) register table (the sink of
    * [[hllRegisterStream]]) down to per-window distinct estimates. */
  def hllWindowEstimate(regs: DataFrame, p: Int = 12): DataFrame =
    graft.operators.Sketches.hllEstimate(
      regs, Seq("win_start", "event_type"), p)

  /** File-source ingestion: readStream over a directory of parquet events,
    * windowed aggregation, partitioned parquet sink with checkpointing.
    * Returns the running query (caller stops it). */
  def ingest(spark: SparkSession, inDir: String, outDir: String,
             checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    windowedCounts(stream)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
