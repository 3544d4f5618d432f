package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD

/** Rebuild a (typically just-checkpointed) DataFrame on the SAME
  * InternalRow RDD, with its carried size estimate CAPPED at
  * Long.MaxValue.
  *
  * Why: Spark 4's `Dataset.localCheckpoint` keeps `originStats` from the
  * pre-checkpoint plan (so broadcast decisions survive checkpointing) —
  * useful, EXCEPT that join size estimates are PRODUCTS of their input
  * sizes. An iterative algorithm that joins its own previous result k
  * times per round therefore compounds the estimate k-fold per round: the
  * BigInt grows to millions of digits and the driver burns unbounded CPU
  * in BigInteger.multiply inside stats estimation (measured on a
  * 2000-edge chain: round time 0.4s -> 119s by round 10, the stat at 28M
  * digits). Capping at Long.MaxValue keeps honest small estimates exact —
  * a genuinely-small checkpointed frame still broadcasts — while
  * collapsing runaway products to "huge", which is all any consumer needs
  * to know. Per-round stats work becomes O(capped leaves), i.e. flat.
  *
  * InternalRow passthrough (no Row encode/decode), hence the private[sql]
  * access and this file's package.
  */
object StatsTruncate {
  private val Cap = BigInt(Long.MaxValue)

  def apply(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val spark = cdf.sparkSession
    val qe = cdf.queryExecution
    // stats of the incoming plan: for a just-checkpointed frame this is
    // the carried originStats; computing it is cheap as long as upstream
    // leaves were themselves capped (which this function guarantees in
    // iterative use)
    val orig = qe.optimizedPlan.stats
    val capped = Statistics(
      sizeInBytes = orig.sizeInBytes.min(Cap),
      rowCount = orig.rowCount.map(_.min(Cap)))
    // UnknownPartitioning deliberately: declaring the checkpointed frame's
    // physical partitioning pins the round's shuffle layout and blocks
    // AQE's small-partition coalescing, which measured ~10% SLOWER than
    // re-shuffling the (small) label frame each round
    val plan = LogicalRDD(
      qe.analyzed.output, qe.toRdd,
      org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(0),
      Nil, false, None)(spark, Some(capped), None)
    classic.Dataset.ofRows(spark, plan)
  }
}
