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
