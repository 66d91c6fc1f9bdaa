package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the admission gate a
  * pipeline runs before promoting a batch (the reference's quarantine
  * split is the two-rule special case of this: a window predicate and
  * its complement, src/sql/bronze_incremental_load.sql). Three rule
  * classes, each with the cheapest plan its scope allows:
  *
  *  - row-local predicates ([[rowChecks]]): ALL rules evaluate in ONE
  *    scan-stage aggregate — adding a rule adds a conditional counter,
  *    not a pass. At 100 TB the difference between k scans and one is
  *    the whole job budget.
  *  - key uniqueness ([[uniquenessCheck]]): one partial+final
  *    aggregate on the key (count vs distinct count).
  *  - referential integrity ([[referentialCheck]]): FK existence join
  *    against the parent key set — only keys shuffle.
  *
  * Every check emits the same one-row shape
  * `(rule, n_checked, n_violations)`, so a full report is a union of
  * bounded single-row frames — trivially collectable, alertable, and
  * oracle-checkable. A NULL predicate result counts as a violation
  * (`IS NOT TRUE` semantics): an expectation that cannot be evaluated
  * is not met.
  */
object Expectations {

  private val Shape = Seq("rule", "n_checked", "n_violations")

  /** All row-local rules in one aggregate pass. `rules` maps rule
    * name → predicate that must hold per row. */
  def rowChecks(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.forall(_._1.matches("[A-Za-z0-9_]+")),
      s"rule names must be identifiers, got ${rules.map(_._1)}")
    // coalesce: sum() over an EMPTY frame is NULL, but an empty batch
    // has zero violations — a gate comparing n_violations === 0 must
    // pass it, not get NULL
    val aggs = count(lit(1)).as("__n") +: rules.map { case (name, pred) =>
      coalesce(sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)),
        lit(0L)).as(s"__v_$name")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules
      .map { case (name, _) => s"'$name', __v_$name" }.mkString(", ")
    one.selectExpr(
        s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)",
        "__n AS n_checked")
      .select(Shape.map(col): _*)
  }

  /** `keys` must be unique: n_violations = surplus rows beyond one
    * per distinct key. */
  def uniquenessCheck(df: DataFrame, ruleName: String,
                      keys: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - count_distinct(struct(keys.map(col): _*)))
          .as("n_violations"))
      .select(lit(ruleName).as("rule"), col("n_checked"),
        col("n_violations"))

  /** Every non-null `fkCol` must exist in `parent.pkCol`. The parent
    * side reduces to its distinct key set before the join, so only
    * keys move; NULL FKs are not violations (SQL FK semantics) but DO
    * count as checked rows. */
  def referentialCheck(child: DataFrame, fkCol: String, parent: DataFrame,
                       pkCol: String, ruleName: String): DataFrame = {
    val pks = parent.select(col(pkCol).as("__pk")).distinct()
    child.select(col(fkCol)).join(pks, col(fkCol) === col("__pk"), "left")
      .agg(count(lit(1)).as("n_checked"),
        coalesce(sum(when(col(fkCol).isNotNull && col("__pk").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_violations"))
      .select(lit(ruleName).as("rule"), col("n_checked"),
        col("n_violations"))
  }

  /** k-anonymity: every combination of the quasi-identifier columns
    * must describe at least k rows — rows in smaller groups are
    * re-identifiable by those attributes alone, the gate a privacy-
    * conscious pipeline runs before user-derived columns may enter a
    * training mix. n_violations = rows living in groups of size < k.
    * One partial+final aggregate on the quasi-identifier key, then a
    * bounded aggregate over the per-group counts — nothing wider than
    * the QI columns ever shuffles. NULL quasi-identifier values group
    * like any other value (an absent attribute is itself a
    * signature). */
  def kAnonymityCheck(df: DataFrame, quasiIds: Seq[String], k: Int,
                      ruleName: String = "k_anonymity"): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiIds.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("n_checked"),
        coalesce(sum(when(col("__n") < k, col("__n")).otherwise(0L)),
          lit(0L)).as("n_violations"))
      .select(lit(ruleName).as("rule"), col("n_checked"),
        col("n_violations"))
  }

  /** Union of check reports, deterministically ordered for compare. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    checks.reduce(_.unionByName(_)).orderBy("rule")
  }
}
