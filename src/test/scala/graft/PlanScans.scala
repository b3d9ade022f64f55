package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** AQE-aware physical-plan probe shared by the plan-pinning specs
  * (LayoutSpec, SimilaritySpec): AQE wraps executed subtrees in
  * `QueryStageExec` LEAVES, so a plain `collect` over the executed plan
  * never reaches the file scans inside them.
  */
object PlanScans {
  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] =
    nodes(p) { case s: FileSourceScanExec => s }

  /** AQE-aware generic collector: like `p.collect(pf)` but descends into
    * adaptive plans and query-stage leaves. Unlike string matching on
    * `p.toString`, this sees only LIVE operators — an `InMemoryRelation`'s
    * rendered build plan (already paid at cache time) is not in the tree.
    */
  def nodes[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = p.collect {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)(pf)
    case q: QueryStageExec => nodes(q.plan)(pf)
    case n if pf.isDefinedAt(n) => Seq(pf(n))
  }.flatten
}
