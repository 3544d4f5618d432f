package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic

/** Rebuild a (typically just-checkpointed) DataFrame on the SAME
  * InternalRow RDD but under a fresh `LogicalRDD` carrying no origin
  * stats.
  *
  * Why: Spark 4's `Dataset.localCheckpoint` keeps `originStats` from the
  * pre-checkpoint plan (so broadcast decisions survive checkpointing). For
  * an iterative algorithm that joins its own previous result k times per
  * round, the size-in-bytes estimate — a PRODUCT over join inputs — then
  * compounds k-fold per round: the BigInt grows to millions of digits and
  * Catalyst burns unbounded driver CPU in BigInteger multiplies just
  * estimating stats (measured on a 2000-edge chain: round time 0.4s ->
  * 119s by round 10, stats at 28M digits). Dropping the stats resets
  * sizeInBytes to the configured default, exactly what a freshly-read
  * input reports.
  *
  * Uses the private[sql] `internalCreateDataFrame` (hence this file's
  * package): InternalRow passthrough, no Row encode/decode round-trip, so
  * it stays O(0) per row at any scale.
  */
object StatsTruncate {
  def apply(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession
      .internalCreateDataFrame(cdf.queryExecution.toRdd, cdf.schema,
        isStreaming = false)
  }
}
