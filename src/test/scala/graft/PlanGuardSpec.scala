package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.PlanGuard

/** PlanGuard behavior: each rule fires on the exact anti-pattern it
  * names, stays quiet on healthy plans, and the allow mechanism is
  * per-call and spelling-checked. */
class PlanGuardSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = graft.queries.Q.t(spark, sf001, "documents")

  test("flags a true cartesian product when broadcast is off") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val crossed = docs.crossJoin(docs.select($"doc_id".as("other")))
      val rules = PlanGuard.findings(crossed).map(_.rule).toSet
      assert(rules.contains("cartesian-product"), rules.toString)
      intercept[IllegalStateException](PlanGuard.assertScaleSafe(crossed))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("flags a conditionless broadcast nested loop; allow() passes it") {
    // the one-row-totals crossJoin shape (e8/t12/x5): legitimate, but
    // only the CALLER knows the side is bounded — so it must be an
    // explicit allowance, not a silent pass
    val totals = docs.agg(count(lit(1)).as("n"))
    val crossed = docs.crossJoin(broadcast(totals))
    val rules = PlanGuard.findings(crossed).map(_.rule).toSet
    assert(rules == Set("unconditional-nested-loop"), rules.toString)
    intercept[IllegalStateException](PlanGuard.assertScaleSafe(crossed))
    PlanGuard.assertScaleSafe(crossed,
      allow = Set("unconditional-nested-loop"))
  }

  test("flags the partitionless window Spark itself only warns about") {
    val ranked = docs.withColumn("rn",
      row_number().over(Window.orderBy($"doc_id")))
    val rules = PlanGuard.findings(ranked).map(_.rule).toSet
    assert(rules == Set("global-window"), rules.toString)
  }

  test("healthy keyed plans produce zero findings") {
    PlanGuard.assertScaleSafe(
      docs.groupBy($"lang").agg(count(lit(1)).as("n")))
    PlanGuard.assertScaleSafe(docs.withColumn("rn",
      row_number().over(Window.partitionBy($"lang").orderBy($"doc_id"))))
    // conditioned nested loops are NOT flagged (legitimate small-side
    // inequality joins execute this way)
    val bands = Seq((0L, 100L), (100L, 1000000L)).toDF("lo", "hi")
    PlanGuard.assertScaleSafe(
      docs.join(broadcast(bands),
        $"n_chars" >= $"lo" && $"n_chars" < $"hi"))
  }

  test("rejects unknown allow spellings instead of silently ignoring") {
    intercept[IllegalArgumentException](
      PlanGuard.assertScaleSafe(docs, allow = Set("cartesian_product")))
  }
}
