package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved the Column/Expression conversion helpers behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * extension libraries shipping their own `Expression`s expose them
  * through a one-file shim inside the sql package — the same pattern
  * other Spark-extension projects use. Nothing else in this repo
  * lives outside the `graft` namespace.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test hook: materialize the function registry an extensions
    * instance would produce at session build (registerFunctions is
    * private[sql]). */
  def buildRegistry(ext: org.apache.spark.sql.SparkSessionExtensions)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())

  /** Test hook: the optimizer rules an extensions instance would
    * inject at session build (buildOptimizerRules is private[sql]). */
  def buildOptimizerRules(ext: org.apache.spark.sql.SparkSessionExtensions,
                          spark: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(spark)
}
