package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** AQE-aware physical-plan probe shared by the plan-pinning specs
  * (LayoutSpec, SimilaritySpec): AQE wraps executed subtrees in
  * `QueryStageExec` LEAVES, so a plain `collect` over the executed plan
  * never reaches the file scans inside them.
  */
object PlanScans {
  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
    case s: FileSourceScanExec => Seq(s)
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: QueryStageExec => fileScans(q.plan)
  }.flatten
}
