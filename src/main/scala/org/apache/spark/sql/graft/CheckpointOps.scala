package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeMap,
  Expression}
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning,
  PartitioningCollection, UnknownPartitioning}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{LogicalRDD, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
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
    val (out, rdd, diff, _) = materialize(df, aIdx, bIdx, truncate = false)
    (out, rdd, diff)
  }

  private def materialize(df: DataFrame, aIdx: Int, bIdx: Int,
                          truncate: Boolean)
      : (DataFrame, RDD[InternalRow], Long, Long) = {
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
    if (truncate) rdd.localCheckpoint()
    val n = rdd.count()
    val orig = qe.optimizedPlan.stats
    val capped = Statistics(
      sizeInBytes = orig.sizeInBytes.min(Cap),
      rowCount = orig.rowCount.map(_.min(Cap)))
    val plan = LogicalRDD(
      qe.analyzed.output, rdd,
      preservedPartitioning(qe.executedPlan, qe.analyzed.output), Nil,
      false, None)(spark, Some(capped), None)
    (classic.Dataset.ofRows(spark, plan), rdd, acc.value, n)
  }

  /** The materialized frame's physical partitioning, carried onto the
    * LogicalRDD so a downstream join/aggregate keyed the same way skips
    * its Exchange (what `Dataset.checkpoint` itself does; the earlier
    * UnknownPartitioning(0) forced every fixpoint loop to re-shuffle
    * state that the previous round's aggregation had just hash-
    * partitioned — guide §2.4, "two operations keyed the same way can
    * share one exchange"). Read AFTER execution, so under AQE this is
    * the FINAL plan's partitioning (including coalesced shuffle reads,
    * whose CoalescedHashPartitioning still satisfies clustered
    * distributions). Attributes are rewritten positionally from the
    * executed output to the analyzed output the LogicalRDD exposes;
    * anything unmappable (or non-expression) falls back to
    * UnknownPartitioning — never a wrong claim, just a redundant
    * exchange. The wrapping mapPartitions is partition-preserving, so
    * the physical layout matches the declaration exactly. */
  private def preservedPartitioning(executed: SparkPlan,
                                    output: Seq[Attribute]): Partitioning = {
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def firstLeaf(p: Partitioning): Partitioning = p match {
      case c: PartitioningCollection => firstLeaf(c.partitionings.head)
      case other => other
    }
    val plan = unwrap(executed)
    val attrMap = AttributeMap(plan.output.zip(output))
    firstLeaf(plan.outputPartitioning) match {
      case e: Expression with Partitioning
          if e.references.forall(attrMap.contains) =>
        e.transform { case a: Attribute => attrMap(a) }
          .asInstanceOf[Partitioning]
      case e: Expression => UnknownPartitioning(e match {
        case p: Partitioning => p.numPartitions
        case _ => 0
      })
      case other => other // non-expression: Unknown/RoundRobin/Single
    }
  }

  /** [[checkpointDiff]] without the diff. */
  def checkpoint(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val (out, rdd, _) = checkpointDiff(df, 0, 0)
    (out, rdd)
  }

  /** [[checkpoint]] that also returns the materialized ROW COUNT — free
    * (the persisting `rdd.count()` already ran; this just surfaces its
    * value), and the hook state-budget guards need: an iterative loop
    * whose per-round state can blow up (pair-state BFS) checks the
    * count the moment each round lands, no second job. */
  def checkpointCount(df: DataFrame): (DataFrame, RDD[InternalRow], Long) = {
    val (out, rdd, _, n) = materialize(df, 0, 0, truncate = false)
    (out, rdd, n)
  }

  /** [[checkpoint]] / [[checkpointCount]] with LINEAGE TRUNCATION
    * (`RDD.localCheckpoint` before the materializing count). The
    * kept-lineage default is right for FIXED-round loops (3-5 rounds:
    * recompute-on-block-loss survives, plan chain stays small), but a
    * loop whose round count is DATA-DEPENDENT — SCC's flood fills run
    * for the live subgraph's diameter — serializes the whole parent RDD
    * chain into every task: measured on the 48-node chain spec, task
    * binaries grew 2.3 → 5.3 MiB over the run, O(rounds²) total
    * serialization. Truncating caps the chain at the previous round's
    * materialized blocks. Trade, explicitly: truncated state CANNOT be
    * recomputed after executor loss — a long-lived cluster deployment
    * should periodically reliable-checkpoint the loop state instead
    * (same knob, `sparkContext.setCheckpointDir` + `RDD.checkpoint`);
    * in this engine the truncated frames are round-internal and
    * superseded copies unpersist only after their successor lands. */
  def checkpointTruncated(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val (out, rdd, _, _) = materialize(df, 0, 0, truncate = true)
    (out, rdd)
  }

  /** See [[checkpointTruncated]]. */
  def checkpointCountTruncated(df: DataFrame)
      : (DataFrame, RDD[InternalRow], Long) = {
    val (out, rdd, _, n) = materialize(df, 0, 0, truncate = true)
    (out, rdd, n)
  }
}
