package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Physical-plan walkers shared by the PlanSpec gates and the plan
  * probes — ONE copy, because AQE nests the real operators inside
  * adaptive/query-stage wrapper nodes that a plain `collect()` does
  * not descend into, and two diverging walkers would make the test
  * and the probe measure different plans. */
object PlanWalk {

  /** Every FileSourceScanExec in the EXECUTED plan, descending
    * AdaptiveSparkPlanExec / QueryStageExec wrappers and subqueries. */
  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(s.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(fileScans) ++
      other.subqueries.flatMap(fileScans)
  }
}
