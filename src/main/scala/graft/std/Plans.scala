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

  /** One-line plan health summary — the counters every scaladoc in this
    * repo asserts by hand ("broadcasts the dim", "no global sort",
    * "filters reach the scan"), packaged as the dev-facing check a
    * pipeline author runs BEFORE shipping a query to the cluster.
    */
  case class PlanHealth(
      exchanges: Int,
      broadcastJoins: Int,
      sortMergeJoins: Int,
      scans: Int,
      scansWithPushedFilters: Int,
      globalSorts: Int,
      topK: Int,
      wholeStageSpans: Int) {
    /** The red flags worth a second look, as human-readable strings. */
    def warnings: Seq[String] = {
      val w = Seq.newBuilder[String]
      if (globalSorts > 0)
        w += s"$globalSorts global sort(s) — every row through one ordering"
      if (sortMergeJoins > 0 && broadcastJoins == 0)
        w += s"$sortMergeJoins sort-merge join(s), nothing broadcast — " +
          "check whether a side is dimension-sized"
      if (scans > 0 && scansWithPushedFilters == 0)
        w += "no scan received a pushed filter — full-table reads"
      w.result()
    }
  }

  /** Compute [[PlanHealth]] for a frame (AQE-aware; plan as currently
    * executed — run the action first for post-AQE counters).
    */
  def health(df: DataFrame): PlanHealth = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, SortMergeJoinExec}
    PlanHealth(
      exchanges = collect(df) {
        case e: ShuffleExchangeExec => e }.size,
      broadcastJoins = collect(df) {
        case e: BroadcastHashJoinExec => e
        case e: BroadcastNestedLoopJoinExec => e }.size,
      sortMergeJoins = collect(df) {
        case e: SortMergeJoinExec => e }.size,
      scans = collect(df) {
        case e: FileSourceScanExec => e }.size,
      scansWithPushedFilters = collect(df) {
        case e: FileSourceScanExec
          if e.dataFilters.nonEmpty || e.partitionFilters.nonEmpty => e
      }.size,
      globalSorts = collect(df) {
        case e: SortExec if e.global => e }.size,
      topK = collect(df) {
        case e: TakeOrderedAndProjectExec => e }.size,
      wholeStageSpans = collect(df) {
        case e: WholeStageCodegenExec => e }.size)
  }
}
