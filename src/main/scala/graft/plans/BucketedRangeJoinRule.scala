package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, DoubleType,
  TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: rewrite a declarative point-in-interval join into
  * the bucketed equi-join [[graft.ops.Ops.bucketedRangeJoin]] builds
  * by hand — so the SQL/DataFrame user writes the natural predicate
  * and still gets the keyed-shuffle plan instead of Spark's
  * BroadcastNestedLoopJoin (O(|L|·|R|), the quadratic cliff on a
  * 100 TB fact table).
  *
  * Matches EXACTLY this shape (the narrowness is the safety story —
  * anything else is left untouched for the planner's default logic):
  *
  * {{{
  *   L JOIN R ON l_ts >= r_start AND l_ts < r_start + INTERVAL c
  * }}}
  *
  * with `l_ts` from the left side only, `r_start` from the right side
  * only, both TimestampType and deterministic, the bound a literal
  * day-free CalendarInterval (a statically known interval length is
  * what makes the bucket width derivable), and no other predicates in
  * the join condition. The rewrite adds `floor(unix_micros(ts) / W)`
  * bucket columns on both sides (the right side exploded across the
  * ≤ 2 buckets its interval can span, exactly the library op's
  * layout), joins on bucket equality AND the original predicate, and
  * projects back to the original output — semantics preserved row for
  * row, plan turned into scan → shuffle-by-bucket → join.
  *
  * Re-application is impossible by construction: the rewritten join's
  * condition carries the bucket EqualTo as a third conjunct, which
  * the two-conjunct match rejects.
  *
  * Install via [[graft.GraftExtensions]] (production) or
  * `spark.experimental.extraOptimizations` (ad hoc / tests).
  */
object BucketedRangeJoinRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(And(c1, c2)), _) =>
        matchRange(left, right, c1, c2) match {
          case Some((ts, start, bound, w)) =>
            rewrite(j, left, right, ts, start, bound, w)
          case None => j
        }
    }

  /** (l_ts, r_start, upper-bound expr, width-in-micros) when the two
    * conjuncts are the half-open range pattern, in either order /
    * comparison direction. */
  private def matchRange(left: LogicalPlan, right: LogicalPlan,
                         c1: Expression, c2: Expression)
      : Option[(Expression, Expression, Expression, Long)] = {
    def fromLeft(e: Expression) =
      e.references.subsetOf(left.outputSet) && e.deterministic &&
        e.dataType == TimestampType
    def fromRight(e: Expression) =
      e.references.subsetOf(right.outputSet) && e.deterministic &&
        e.dataType == TimestampType

    // normalize `a >= b` / `b <= a` to (a, b)
    def geq(c: Expression): Option[(Expression, Expression)] = c match {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case LessThanOrEqual(b, a) => Some((a, b))
      case _ => None
    }
    // normalize `a < bound` / `bound > a` (and the closed BETWEEN
    // forms `a <= bound` / `bound >= a`) to (a, bound). Open or
    // closed makes no difference to bucket COVERAGE — b(ts) still
    // falls in [b(start), b(bound)] — and the original comparison is
    // kept as the residual filter, so semantics ride along verbatim.
    def lt(c: Expression): Option[(Expression, Expression)] = c match {
      case LessThan(a, bound) => Some((a, bound))
      case GreaterThan(bound, a) => Some((a, bound))
      case LessThanOrEqual(a, bound) => Some((a, bound))
      case GreaterThanOrEqual(bound, a) => Some((a, bound))
      case _ => None
    }
    // start + literal interval, with the interval's length (micros)
    // statically known: ANSI day-time interval literals and day-free
    // legacy CalendarInterval literals qualify
    def boundOf(e: Expression): Option[(Expression, Long)] = e match {
      case TimestampAddInterval(s, Literal(us: Long, _: DayTimeIntervalType),
          _) if us > 0 =>
        Some((s, us))
      case TimestampAddInterval(s, Literal(iv: CalendarInterval, _), _)
          if iv.months == 0 && iv.days == 0 && iv.microseconds > 0 =>
        Some((s, iv.microseconds))
      case _ => None
    }

    val candidates = Seq((c1, c2), (c2, c1))
    candidates.flatMap { case (g, l) =>
      for {
        (ts1, s1) <- geq(g)
        (ts2, bound) <- lt(l)
        (s2, w) <- boundOf(bound)
        if ts1.semanticEquals(ts2) && s1.semanticEquals(s2) &&
          fromLeft(ts1) && fromRight(s1)
      } yield (ts1, s1, bound, w)
    }.headOption
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      ts: Expression, start: Expression,
                      bound: Expression, w: Long): LogicalPlan = {
    // floor over a double divide — bit-identical bucketing to
    // Ops.bucketedRangeJoin (exact for |micros| < 2^53, i.e. every
    // timestamp before the year ~2255)
    def bucket(e: Expression): Expression =
      Floor(Divide(Cast(UnixMicros(e), DoubleType),
        Literal(w.toDouble, DoubleType)))

    val leftAlias = Alias(bucket(ts), "__b_l")()
    val newLeft = Project(left.output :+ leftAlias, left)

    // the interval's upper bound is the matched expression itself —
    // reused verbatim, so no interval arithmetic is rebuilt here
    val seq = Sequence(bucket(start), bucket(bound), None,
      Some(conf.sessionLocalTimeZone))
    val explode = Explode(seq)
    val genAttr = {
      val f = explode.elementSchema.head
      AttributeReference("__b_r", f.dataType, f.nullable)()
    }
    val newRight = Generate(explode, unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(genAttr),
      child = right)

    val newCond = And(EqualTo(leftAlias.toAttribute, genAttr),
      j.condition.get)
    Project(j.output,
      Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}
