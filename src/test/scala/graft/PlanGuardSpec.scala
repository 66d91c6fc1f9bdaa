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

  test("flags an expensive stream derivation pipelined under a BNLJ") {
    // the x7 shape: a fused-expression column derived on the stream
    // side of a broadcast join re-evaluates per PAIR (41 s → 3.6 s at
    // the 10× replica); a repartition barrier between derivation and
    // join materializes it per row and clears the finding
    import graft.functions.GraftFunctions
    val embs = spark.read.parquet(s"$sf001/embeddings.parquet")
    val derived = embs.select($"vec_id",
      GraftFunctions.l2_normalize($"embedding".cast("array<double>"))
        .as("vn"))
    val q = embs.filter($"vec_id" < 3).select($"vec_id".as("qid"))
    val joined = derived.join(broadcast(q), $"qid" =!= $"vec_id")
    val rules = PlanGuard.findings(joined).map(_.rule).toSet
    assert(rules.contains("bnlj-deferred-derivation"), rules.toString)
    val barriered = derived.repartition($"vec_id")
      .join(broadcast(q), $"qid" =!= $"vec_id")
    val after = PlanGuard.findings(barriered).map(_.rule).toSet
    assert(!after.contains("bnlj-deferred-derivation"), after.toString)
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

  test("flags an expensive loop-invariant inside a HOF lambda") {
    // the exact x5/quantize bug: array_min(v) referenced from inside
    // transform's lambda is re-evaluated per ELEMENT — O(d²) per row
    val v = col("embedding")
    val embs = graft.queries.Q.t(spark, sf001, "embeddings")
    val bad = embs.select(
      transform(v, x => x - array_min(v)).as("centered"))
    val rules = PlanGuard.findings(bad).map(_.rule).toSet
    assert(rules == Set("lambda-invariant-recompute"), rules.toString)

    // hoisted form (the Similarity.quantize discipline): quiet.
    // NOTE the alias must be MULTI-use — CollapseProject inlines a
    // single-use alias straight back into the lambda, re-creating
    // the recompute (this rule catches exactly that regression).
    val good = embs.select(v.as("__arr"), array_min(v).as("__mn"))
      .select(transform(col("__arr"),
        x => when(col("__mn") === 0.0, x).otherwise(x - col("__mn")))
        .as("centered"))
    assert(PlanGuard.findings(good).isEmpty)

    // single-use hoist: CollapseProject undoes it — the rule fires,
    // proving it audits the OPTIMIZED plan, not the author's intent
    val undone = embs.select(v.as("__arr"), array_min(v).as("__mn"))
      .select(transform(col("__arr"), x => x - col("__mn")).as("centered"))
    assert(PlanGuard.findings(undone).map(_.rule).toSet ==
      Set("lambda-invariant-recompute"))

    // a nested HOF that READS the outer lambda variable is variant —
    // genuinely per-element work, not a hoistable constant, no finding
    val variant = embs.select(
      filter(v, x => exists(v, y => y > x)).as("f"))
    val vr = PlanGuard.findings(variant).map(_.rule).toSet
    assert(!vr.contains("lambda-invariant-recompute"), vr.toString)
  }

  test("rejects unknown allow spellings instead of silently ignoring") {
    intercept[IllegalArgumentException](
      PlanGuard.assertScaleSafe(docs, allow = Set("cartesian_product")))
  }
}
