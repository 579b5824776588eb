package graft.std

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Physical-plan inspection that sees through AQE — the shared walker
  * behind every plan-shape assertion ([[graft.sources.Bucketing
  * .exchangeCount]], [[graft.sources.Layout]]'s scan finder).
  *
  * Why it exists: AQE wraps the real plan in an `AdaptiveSparkPlanExec`
  * whose children a plain `TreeNode.collect` never reaches, so a naive
  * walk reports 0 matches for EVERY query — a vacuously "clean" plan.
  * The descent goes through `a.executedPlan` (the current physical
  * plan: initial post-EnsureRequirements before any action, the
  * stage-substituted final plan after) — NOT `a.inputPlan`, which
  * predates exchange insertion and would hide every shuffle. Stage
  * wrappers (`QueryStageExec`) are unwrapped the same way.
  */
object Plans {

  /** `plan.collect(pf)`, but AQE-aware. */
  def collect[A](df: DataFrame)(pf: PartialFunction[SparkPlan, A]): Seq[A] = {
    def walk(p: SparkPlan): Seq[A] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      pf.lift(p).toSeq ++ kids.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }
}
