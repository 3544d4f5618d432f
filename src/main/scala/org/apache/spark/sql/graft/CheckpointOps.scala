package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Manual materialization for iterative dataflows — `localCheckpoint`
  * with the two pieces `Dataset.localCheckpoint` doesn't give you:
  *
  *  1. **A handle on the persisted RDD**, so the caller can `unpersist`
  *     a round's blocks the moment the next round has materialized.
  *     `Dataset.localCheckpoint` leaks every round's blocks until driver
  *     GC + ContextCleaner get around to them; in a long back-to-back
  *     query run (or a long-lived cluster app) that deferred cleanup
  *     lands inside LATER queries' run time — measured in round 3 as a
  *     2-4x inflation of everything benched after the checkpoint-heavy
  *     queries.
  *  2. **Fused change-detection**: an accumulator counts rows where two
  *     columns differ DURING the materialization pass, so an iterative
  *     fixpoint (connected components) needs one Spark job per round,
  *     not checkpoint + a second convergence-probe job.
  *
  * Stats are capped exactly like [[StatsTruncate]] (see there for the
  * BigInt-blowup rationale). Unlike `RDD.localCheckpoint`, lineage is NOT
  * truncated — on block loss (executor death on a real cluster) Spark can
  * still recompute through the parent chain, at the cost of a driver-side
  * plan chain that grows O(rounds); bounded in practice by `maxIter`.
  */
object CheckpointOps {
  private val Cap = BigInt(Long.MaxValue)

  /** Materialize `df` into persisted blocks and return (frame-on-blocks,
    * rdd-handle, count-of-rows-where-col(aIdx) != col(bIdx)). Pass
    * aIdx = bIdx to skip the diff (returns 0). Null-safe: null != non-null
    * counts as a change. */
  def checkpointDiff(df: DataFrame, aIdx: Int, bIdx: Int)
      : (DataFrame, RDD[InternalRow], Long) = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val spark = cdf.sparkSession
    val qe = cdf.queryExecution
    val types = qe.analyzed.output.map(_.dataType)
    val (aType, bType) = (types(aIdx), types(bIdx))
    val acc = spark.sparkContext.longAccumulator("graft.checkpointDiff")
    val trackDiff = aIdx != bIdx
    val rdd = qe.toRdd.mapPartitions { it =>
      it.map { r =>
        if (trackDiff) {
          val a = if (r.isNullAt(aIdx)) null else r.get(aIdx, aType)
          val b = if (r.isNullAt(bIdx)) null else r.get(bIdx, bType)
          if (a != b) acc.add(1L)
        }
        r.copy()
      }
    }
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    val orig = qe.optimizedPlan.stats
    val capped = Statistics(
      sizeInBytes = orig.sizeInBytes.min(Cap),
      rowCount = orig.rowCount.map(_.min(Cap)))
    val plan = LogicalRDD(
      qe.analyzed.output, rdd, UnknownPartitioning(0), Nil, false,
      None)(spark, Some(capped), None)
    (classic.Dataset.ofRows(spark, plan), rdd, acc.value)
  }

  /** [[checkpointDiff]] without the diff. */
  def checkpoint(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val (out, rdd, _) = checkpointDiff(df, 0, 0)
    (out, rdd)
  }
}
