package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{FilterExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
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
  *  - `lambda-invariant-recompute`: a higher-order-function lambda
  *    whose body contains an O(array)-cost subexpression (array
  *    min/max/sort/…, or a nested HOF) that references NO lambda
  *    variable — so it is loop-INVARIANT yet re-evaluated per
  *    ELEMENT, because a lambda body sits outside project-level
  *    subexpression elimination. `transform(v, x -> … array_min(v)
  *    …)` is O(d²) per row — measured 28× slower than the hoisted
  *    form at d=64. Fix: alias the invariant in its OWN projection
  *    (multi-use non-trivial aliases survive CollapseProject) and
  *    reference the resulting attribute from the lambda — the
  *    [[graft.ext.Similarity.quantize]] discipline.
  *  - `bnlj-deferred-derivation`: an expensive derived column (a
  *    fused graft expression or a HOF) projected on the STREAM side
  *    of a BroadcastNestedLoopJoin with no materialization boundary
  *    between — whole-stage codegen defers the derivation into the
  *    join loop, so it re-evaluates once per OUTPUT PAIR instead of
  *    per stream row. Found the hard way: x7's PQ encode ran 41 s
  *    instead of 3.6 s at the 10× replica, single-tasked inside the
  *    generated loop, and the rule then caught the SAME latent bug
  *    in x5's dequantization — whose scaladoc claimed per-row
  *    evaluation. Fix: one exchange (repartition on the row key)
  *    between derivation and join — the
  *    [[graft.ext.Similarity.pqTopK]] shape. One-row build sides
  *    (pair multiplier exactly 1) are the benign case the audit
  *    list carries.
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
    Set("cartesian-product", "global-window", "unconditional-nested-loop",
      "lambda-invariant-recompute", "bnlj-deferred-derivation")

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
      case j: BroadcastNestedLoopJoinExec =>
        val uncond =
          if (j.condition.isEmpty)
            Seq(Finding("unconditional-nested-loop", j.nodeName,
              "give the join a condition, or accept it explicitly for a " +
                "contract-small side"))
          else Seq.empty
        uncond ++ deferredDerivationFindings(j)
      case _ => Seq.empty
    }
    here ++ plan.expressions.flatMap(lambdaFindings) ++
      plan.children.flatMap(scan) ++
      plan.subqueries.flatMap(scan)
  }

  // ---- bnlj-deferred-derivation --------------------------------------

  /** Whole-stage codegen defers STREAM-side derived columns into a
    * broadcast-nested-loop join's inner loop: a Project pipelined
    * under the join (no materialization boundary between) has its
    * expressions re-evaluated once per OUTPUT PAIR, not per stream
    * row. Harmless for casts; catastrophic for per-row-expensive
    * derivations — the x7 PQ encode (a 4-argmax codes array) ran
    * 41 s instead of 3.6 s at the 10× replica from exactly this,
    * single-tasked inside the generated loop. The fix is one
    * exchange (e.g. `repartition(key)`) between the derivation and
    * the join — which is also the production posture, since such a
    * derived column is usually the stored index. */
  private def deferredDerivationFindings(
      j: BroadcastNestedLoopJoinExec): Seq[Finding] = {
    val streamed = j.buildSide match {
      case BuildRight => j.left
      case BuildLeft => j.right
    }
    pipelinedProjects(streamed).flatMap { pr =>
      pr.projectList.filter(isCostlyDerivation).map(e =>
        Finding("bnlj-deferred-derivation",
          s"${j.nodeName} ← Project[${e.toString.take(60)} …]",
          "materialize the derived column behind an exchange (e.g. " +
            "repartition) before the broadcast join — codegen defers " +
            "stream-side derivations into the join loop, re-evaluating " +
            "them per PAIR (Similarity.pqTopK shape)"))
    }
  }

  /** Projects pipelined with the consumer above them: Filter and the
    * codegen wrapper pass rows through without materializing;
    * InputAdapter is a codegen-stage boundary (its child's rows ARE
    * materialized) and everything else (exchange, sort, aggregate,
    * scan) materializes — both stop the walk. */
  private def pipelinedProjects(p: SparkPlan): Seq[ProjectExec] = p match {
    case pr: ProjectExec => pr +: pipelinedProjects(pr.child)
    case f: FilterExec => pipelinedProjects(f.child)
    case w: WholeStageCodegenExec => pipelinedProjects(w.child)
    case _: InputAdapter => Seq.empty
    case _ => Seq.empty
  }

  /** Expensive enough that a per-pair re-evaluation is a plan bug:
    * any of this library's fused expressions (each is an O(array) or
    * worse loop — that is why they exist) or a higher-order function
    * (interpreted per-element lambda). */
  private def isCostlyDerivation(e: Expression): Boolean =
    e.exists(x => x.getClass.getName.startsWith("graft.functions.") ||
      x.isInstanceOf[HigherOrderFunction])

  // ---- lambda-invariant-recompute ------------------------------------

  /** O(array-length) evaluation cost by expression class name — the
    * things that hurt when re-run once per element of an enclosing
    * lambda. Size is absent on purpose (array length is O(1)). */
  private val ExpensivePerElement = Set(
    "ArrayMin", "ArrayMax", "SortArray", "ArraySort", "ArrayDistinct",
    "ArrayIntersect", "ArrayUnion", "ArrayExcept", "ArraysOverlap",
    "ArrayPosition", "ArrayContains", "ArrayJoin", "ArraysZip", "Reverse")

  private def isExpensive(e: Expression): Boolean =
    e.exists(x => x.isInstanceOf[HigherOrderFunction] ||
      ExpensivePerElement.contains(x.getClass.getSimpleName))

  /** Lambda-variable ids referenced by `e` but not bound by a
    * LambdaFunction INSIDE `e` — nonempty means the subtree actually
    * varies with some enclosing lambda's element. */
  private def freeLambdaVars(e: Expression): Set[Long] = {
    val used = e.collect {
      case v: NamedLambdaVariable => v.exprId.id
    }.toSet
    val bound = e.collect { case f: LambdaFunction =>
      f.arguments.collect { case v: NamedLambdaVariable => v.exprId.id }
    }.flatten.toSet
    used -- bound
  }

  /** For every HOF lambda body in `root`: the OUTERMOST subtrees that
    * are expensive yet reference no enclosing lambda variable, i.e.
    * per-element recomputation of a per-row constant. (Structured as
    * flat helper methods, not nested partial-function literals —
    * scalac 2.13's backend asserts emitting the nested-anonfun form.) */
  private def lambdaFindings(root: Expression): Seq[Finding] = {
    val hofs = root.collect { case hof: HigherOrderFunction => hof }
    hofs.flatMap(hofFindings)
  }

  private def hofFindings(hof: HigherOrderFunction): Seq[Finding] =
    hof.functions.flatMap { f =>
      f match {
        case LambdaFunction(body, _, _) =>
          invariantExpensive(body).map(t => mkFinding(hof, t))
        case _ => Seq.empty
      }
    }

  private def mkFinding(hof: HigherOrderFunction, t: Expression): Finding =
    Finding("lambda-invariant-recompute",
      s"${hof.prettyName}(…, ${t.toString.take(80)} …)",
      "alias the invariant into its own projection and reference " +
        "the attribute from the lambda (Similarity.quantize shape)")

  /** Outermost invariant-expensive subtrees of a lambda body. Does
    * not descend into a hit (one finding per hoistable unit) but DOES
    * descend into variant subtrees to find invariant islands. */
  private def invariantExpensive(e: Expression): Seq[Expression] =
    if (freeLambdaVars(e).isEmpty) {
      if (isExpensive(e)) Seq(e) else Seq.empty
    } else e.children.flatMap(invariantExpensive)

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
