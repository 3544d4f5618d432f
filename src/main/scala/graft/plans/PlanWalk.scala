package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Physical-plan walkers shared by the PlanSpec gates and the plan
  * probes — ONE copy, because AQE nests the real operators inside
  * adaptive/query-stage wrapper nodes that a plain `collect()` does
  * not descend into, and two diverging walkers would make the test
  * and the probe measure different plans. */
object PlanWalk {

  /** Every FileSourceScanExec in the EXECUTED plan, descending
    * AdaptiveSparkPlanExec / QueryStageExec wrappers, subqueries, and
    * cached relations (a pinned multi-consumer frame moves its scan
    * inside the InMemoryRelation's cached plan — the scan still runs,
    * exactly once, when the cache fills; the gates must keep seeing
    * it). */
  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(s.plan)
    case f: FileSourceScanExec => Seq(f)
    case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      fileScans(m.relation.cachedPlan) ++
        m.children.flatMap(fileScans) ++ m.subqueries.flatMap(fileScans)
    case other => other.children.flatMap(fileScans) ++
      other.subqueries.flatMap(fileScans)
  }
}
