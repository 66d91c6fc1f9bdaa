package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Pre-flight plan linting: the PlanSpec discipline (no cartesian
  * products, no corpus-wide single-task windows) packaged as a
  * runtime guard a pipeline can run BEFORE executing a user-composed
  * query at 100 TB — at that scale a plan anti-pattern is not a slow
  * job, it is a cluster-day. The checks are deliberately few and
  * precise (each names the node and the fix) so the guard can gate a
  * production submit without false-positive fatigue:
  *
  *  - `cartesian-product`: a CartesianProductExec multiplies its
  *    inputs row-by-row — at any real scale this is the plan Spark
  *    produces when a join condition was forgotten or not
  *    equi-expressible. Fix: add an equi-key, bucket the range
  *    condition ([[BucketedRangeJoinRule]]), or broadcast the small
  *    side explicitly.
  *  - `global-window`: a WindowExec with an EMPTY partition spec
  *    moves every row to ONE task (Spark itself only warns). Fix:
  *    partition the window, or replace rank-then-filter with a
  *    bounded aggregate ([[graft.ops.TopKAgg]]) or
  *    TakeOrderedAndProject (orderBy + limit).
  *  - `unconditional-nested-loop`: a BroadcastNestedLoopJoin with no
  *    join condition compares every pair (a cross join in broadcast
  *    clothing). Conditioned nested loops are allowed — they are how
  *    legitimate small-side inequality joins execute.
  *
  * Bounded relations are invisible at plan level, so callers joining
  * a KNOWN-tiny frame crosswise (a one-row totals broadcast — the e8
  * / t12 / x5 shape) pass an `allow` set naming the rule they accept;
  * the allowance is per-call and shows up at the call site, which is
  * exactly where a reviewer wants to see it.
  */
object PlanGuard {

  final case class Finding(rule: String, node: String, fix: String)

  val Rules: Set[String] =
    Set("cartesian-product", "global-window", "unconditional-nested-loop")

  /** All findings in df's executed plan (empty = scale-safe). */
  def findings(df: DataFrame): Seq[Finding] =
    scan(df.queryExecution.executedPlan)

  private def scan(plan: SparkPlan): Seq[Finding] = {
    // AQE hides the real tree behind AdaptiveSparkPlanExec and keeps
    // exchange/broadcast subtrees out of children — walk through both
    val here = plan match {
      case a: AdaptiveSparkPlanExec => return scan(a.executedPlan)
      case c: CartesianProductExec =>
        Seq(Finding("cartesian-product", c.nodeName,
          "add an equi-join key, bucket the range condition, or " +
            "broadcast the provably-small side"))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Seq(Finding("global-window", w.nodeName,
          "partition the window, or use a bounded top-k aggregate / " +
            "orderBy+limit instead of rank-then-filter"))
      case j: BroadcastNestedLoopJoinExec if j.condition.isEmpty =>
        Seq(Finding("unconditional-nested-loop", j.nodeName,
          "give the join a condition, or accept it explicitly for a " +
            "contract-small side"))
      case _ => Seq.empty
    }
    here ++ plan.children.flatMap(scan) ++
      plan.subqueries.flatMap(scan)
  }

  /** Throw unless every finding's rule is in `allow`. The message
    * lists each offending node with its fix, so the failure is
    * actionable from the log alone. */
  def assertScaleSafe(df: DataFrame, allow: Set[String] = Set.empty): Unit = {
    require(allow.subsetOf(Rules), s"unknown rules: ${allow.diff(Rules)}")
    val bad = findings(df).filterNot(f => allow.contains(f.rule))
    if (bad.nonEmpty) throw new IllegalStateException(
      "plan is not scale-safe:\n" + bad.map(f =>
        s"  [${f.rule}] ${f.node} — fix: ${f.fix}").mkString("\n"))
  }
}
