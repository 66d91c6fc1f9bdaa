package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Ops

/** As-of join semantics + bucketed co-located join (scale plumbing). */
class AsofBucketSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks greatest rightTs <= leftTs per key, null when none") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 9.99),
      (1L, ts("2024-01-01 11:00:00"), 101L, 10.50),
      (1L, ts("2024-01-01 11:00:00"), 102L, 10.75), // tie: higher id wins
      (2L, ts("2024-01-01 12:00:00"), 200L, 55.0)
    ).toDF("k", "qts", "qid", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"), // matches 100
      (1L, ts("2024-01-01 11:00:00"), "t2"), // equal ts: matches 102 (<=, tie)
      (1L, ts("2024-01-01 09:00:00"), "t3"), // before any quote: null
      (2L, ts("2024-01-01 13:00:00"), "t4"), // matches 200
      (3L, ts("2024-01-01 13:00:00"), "t5")  // key with no quotes: null
    ).toDF("k", "tts", "tag")

    val got = Ops.asofJoin(trades, quotes, "k", "tts", "qts",
        Seq("qid", "price"), "qid")
      .select($"tag", $"qid")
      .as[(String, Option[Long])].collect().toMap
    assert(got == Map("t1" -> Some(100L), "t2" -> Some(102L),
      "t3" -> None, "t4" -> Some(200L), "t5" -> None))
  }

  test("asofJoin forward/nearest directions match their contracts") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 9.99),
      (1L, ts("2024-01-01 11:00:00"), 101L, 10.50),
      (1L, ts("2024-01-01 11:00:00"), 102L, 10.75),
      (2L, ts("2024-01-01 12:00:00"), 200L, 55.0)
    ).toDF("k", "qts", "qid", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"),
      (1L, ts("2024-01-01 11:00:00"), "t2"), // equal ts
      (1L, ts("2024-01-01 09:00:00"), "t3"), // before all quotes
      (1L, ts("2024-01-01 11:30:00"), "t4"), // after all k=1 quotes
      (1L, ts("2024-01-01 10:35:00"), "t5"), // 35 min back, 25 min fwd
      (2L, ts("2024-01-01 13:00:00"), "t6"), // after k=2's only quote
      (3L, ts("2024-01-01 13:00:00"), "t7")  // no quotes at all
    ).toDF("k", "tts", "tag")
    def run(direction: String): Map[String, Option[Long]] =
      Ops.asofJoin(trades, quotes, "k", "tts", "qts",
          Seq("qid", "price"), "qid", direction)
        .select($"tag", $"qid")
        .as[(String, Option[Long])].collect().toMap
    // forward: smallest qts >= tts; equal ts included; greatest id
    // at the tied smallest qts
    assert(run("forward") == Map(
      "t1" -> Some(102L), // next quote is the 11:00 pair, id 102 wins
      "t2" -> Some(102L), // equal ts counts (>=)
      "t3" -> Some(100L),
      "t4" -> None,       // nothing later
      "t5" -> Some(102L),
      "t6" -> None,
      "t7" -> None))
    // nearest: closer side wins; equal-ts is distance 0 backward;
    // only-backward / only-forward fall through to that side. The
    // within-side tie rule is direction-asymmetric by construction
    // of the one-sort plan (backward = greatest id, forward-leg =
    // SMALLEST id — see the j10 oracle, which encodes the same)
    assert(run("nearest") == Map(
      "t1" -> Some(100L), // 30 min back vs 30 min fwd: tie -> backward
      "t2" -> Some(102L), // distance 0 backward
      "t3" -> Some(100L), // only forward exists
      "t4" -> Some(102L), // only backward exists
      "t5" -> Some(101L), // 25 min fwd beats 35 min back; fwd-leg tie
                          // at 11:00 goes to the smallest id
      "t6" -> Some(200L),
      "t7" -> None))
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val li = graft.queries.Q.t(spark, sf001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = graft.queries.Q.t(spark, sf001, "orders")
      .select("o_orderkey", "o_totalprice")

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    // disable broadcast so the join strategy must exploit bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the join key: no shuffle exchange
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
