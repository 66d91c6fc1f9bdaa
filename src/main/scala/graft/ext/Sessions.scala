package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (extension): group a user's events into
  * sessions separated by inactivity gaps — the standard first step of
  * behavioral / training-log analytics.
  *
  * Batch formulation: analytic windows only — `lag` to detect gaps,
  * a running `sum` of gap flags to number sessions, then one grouped
  * aggregate per session. Two shuffles total (both keyed by user), no
  * self-joins; the per-user window is the textbook use of
  * `Window.partitionBy(user).orderBy(ts)` and holds at any corpus
  * size as long as single users stay in memory (salt pathological
  * power-users before the window at extreme scale).
  *
  * The streaming twin is [[graft.streaming.StatefulSessions]]
  * (flatMapGroupsWithState); a spec asserts they produce identical
  * sessions on a replayed stream.
  */
object Sessions {

  /** Assign a session index per user: 0-based, incremented whenever
    * the gap to the previous event exceeds `gapMinutes`. */
  def withSessionId(events: DataFrame, gapMinutes: Int,
                    userCol: String = "user_id",
                    tsCol: String = "ts"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull, 1)
          .when(unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev")) > gapSec, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__prev", "__new_session")
  }

  /** One row per (user, session): bounds, event count, exact value
    * sum. Deterministically ordered. */
  def sessionize(events: DataFrame, gapMinutes: Int,
                 userCol: String = "user_id",
                 tsCol: String = "ts",
                 valueCol: String = "value"): DataFrame =
    withSessionId(events, gapMinutes, userCol, tsCol)
      .groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
           max(col(tsCol)).as("session_end"),
           count(lit(1)).as("n_events"),
           graft.ops.Ops.sumMoney(col(valueCol)).as("sum_value"))
      .orderBy(col(userCol), col("session_id"))

  /** Cumulative distinct keys by period — "total unique users through
    * day D", the growth curve every event pipeline reports. The naive
    * formulation is a running COUNT(DISTINCT key) window, which must
    * hold every key ever seen in one ordered partition's state — the
    * exact shape that cannot scale. The identity that fixes it: a key
    * is new exactly once (at its MIN ts), so the cumulative distinct
    * count is a running SUM of first-seen counts:
    *
    *  1. groupBy(key) → min(ts): one key-hashed shuffle with map-side
    *     partial mins — events never sort, keys never co-reside;
    *  2. bucket first-seen ts by `period`, count: a shuffle of ONE
    *     row per key;
    *  3. running sum over periods: a global window, but over one row
    *     per period — calendar-bounded (a decade of days is ~3.7 k
    *     rows), which is why RegistryGuardSpec pins it as an audited
    *     global-window exception rather than a violation.
    *
    * Returns (period, new_keys, cum_keys), ordered. */
  def cumulativeNewKeys(events: DataFrame, period: String = "day",
                        keyCol: String = "user_id",
                        tsCol: String = "ts"): DataFrame = {
    val firstSeen = events.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__first_ts"))
    val perPeriod = firstSeen
      .groupBy(date_trunc(period, col("__first_ts")).as("period"))
      .agg(count(lit(1)).as("new_keys"))
    val w = Window.orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, 0)
    perPeriod
      .withColumn("cum_keys", sum(col("new_keys")).over(w))
      .orderBy("period")
  }

  /** First-touch conversion funnel: how many users complete each
    * prefix of an ordered step sequence (e.g. view → click →
    * purchase) within `windowDays` of their FIRST step-1 event.
    *
    * Semantics are the standard first-touch chain: t1 = the user's
    * earliest step-1 event; t_i = the earliest step-i event STRICTLY
    * after t_{i-1}; the user counts at step i iff t_i exists and
    * t_i <= t1 + windowDays. Greedy-first is not maximal matching —
    * a user whose first chain misses the window is not re-matched
    * through a later t1 — which is the conventional funnel contract
    * and the one the oracle mirrors.
    *
    * Shape: the chained first-touch times are per-user whole-
    * partition `min(when(...))` windows over ONE user-keyed
    * Exchange (Catalyst stacks the Window operators; no join per
    * step), then one user-grouped aggregate and one global 1-row
    * roll-up. Holds at any corpus size: per-user state is the step
    * count, the global aggregate sees one row per user partition. */
  def funnel(events: DataFrame, steps: Seq[String], windowDays: Int,
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(steps.size >= 2, "funnel needs at least two steps")
    val byUser = Window.partitionBy(col(userCol))
    var chained = events.select(col(userCol), col(typeCol), col(tsCol))
    steps.zipWithIndex.foreach { case (step, i) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"__t${i - 1}")
      chained = chained.withColumn(s"__t$i",
        min(when(cond, col(tsCol))).over(byUser))
    }
    val perUser = chained.groupBy(col(userCol))
      .agg(max(col("__t0")).as("__t0"),
        steps.indices.drop(1).map(i => max(col(s"__t$i")).as(s"__t$i")): _*)
    val deadline = col("__t0") + expr(s"INTERVAL $windowDays DAYS")
    val counts = perUser.agg(
      count(when(col("__t0").isNotNull, 1)).as("__n0"),
      steps.indices.drop(1).map(i =>
        count(when(col(s"__t$i").isNotNull && col(s"__t$i") <= deadline, 1))
          .as(s"__n$i")): _*)
    val stepRows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step"), lit(step).as("event_type"),
        col(s"__n$i").as("n_users"), col("__n0").as("__n_first"))
    }
    counts.select(explode(array(stepRows: _*)).as("r"))
      .select(col("r.step").as("step"), col("r.event_type").as("event_type"),
        col("r.n_users").as("n_users"), col("r.__n_first").as("__n_first"))
      .withColumn("pct_of_first",
        when(col("__n_first") === 0, lit(null).cast("double"))
          .otherwise(graft.ops.Ops.roundDet(
            col("n_users").cast("double") / col("__n_first"), 4)))
      .drop("__n_first")
      .orderBy("step")
  }

  /** Peak concurrent sessions per hour — the sweep-line answer to
    * "how many sessions overlap", computed WITHOUT the interval
    * self-join (whose pair mass is quadratic in co-active sessions).
    * Each session contributes +1 at its start minute and −1 at the
    * minute after its end; concurrency at any boundary is the
    * running sum of deltas, and the hourly report takes the max over
    * the boundaries inside each hour AND the level carried in from
    * before the hour's first boundary (lag of the running sum): an
    * hour whose first boundary is a session END would otherwise
    * report below the true peak reached during its opening minutes.
    * Minute granularity makes the delta table CALENDAR-BOUNDED (one
    * row per minute with activity, ≤ 44 k/month), so the running-sum
    * window — global by nature, concurrency has no partition key —
    * runs over bounded rows, the same audited shape as w4's
    * cumulative count. Hours with no session boundary are absent
    * from the report (concurrency is flat there, carried from the
    * last boundary).
    *
    * Returns (hour, max_concurrent, n_boundaries), ordered. */
  def hourlyConcurrency(events: DataFrame, gapMinutes: Int,
                        userCol: String = "user_id",
                        tsCol: String = "ts"): DataFrame = {
    // bounds only — no value aggregate, so any (user, ts) frame works
    val sessions = withSessionId(events, gapMinutes, userCol, tsCol)
      .groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
    val deltas = sessions.select(explode(array(
        struct(date_trunc("minute", col("session_start")).as("m"),
          lit(1L).as("d")),
        struct((date_trunc("minute", col("session_end")) +
          expr("INTERVAL 1 MINUTE")).as("m"), lit(-1L).as("d"))))
        .as("e"))
      .select(col("e.m").as("m"), col("e.d").as("d"))
      .groupBy("m").agg(sum(col("d")).as("delta"))
    val w = Window.orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // carried = concurrency just BEFORE this boundary; per hour the
    // earliest boundary's carried value is the level the hour opened
    // at (0 before the first boundary globally). Both windows share
    // the one global order, so Catalyst plans a single sort.
    deltas
      .withColumn("conc", sum(col("delta")).over(w))
      .withColumn("carried",
        coalesce(lag(col("conc"), 1).over(Window.orderBy(col("m"))),
          lit(0L)))
      .groupBy(date_trunc("hour", col("m")).as("hour"))
      .agg(greatest(max(col("conc")), min_by(col("carried"), col("m")))
          .cast("long").as("max_concurrent"),
        count(lit(1)).as("n_boundaries"))
      .orderBy("hour")
  }

  /** Weekly cohort retention grid: users bucketed by the week of
    * their first event (cohort), counted in every later week they
    * were active, with retention as a fraction of the cohort's size
    * (its week-0 count — every user is active in week 0 by
    * definition of "first event").
    *
    * Shape: first-seen is one user-keyed aggregate; the activity
    * join is user-keyed against that same partitioning (co-located,
    * no extra Exchange side); the grid aggregate is keyed by
    * (cohort_week, week_offset) — calendar-bounded cardinality; the
    * cohort-size window partitions by cohort_week, also calendar-
    * bounded. Week arithmetic stays on date_trunc('week') Mondays on
    * both engines so offset = days/7 is exact. */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val e = events.select(col(userCol).as("__u"), col(tsCol).as("__ts"))
    val first = e.groupBy("__u").agg(min(col("__ts")).as("__first_ts"))
    val active = e.join(first, "__u")
      .select(date_trunc("week", col("__first_ts")).as("cohort_week"),
        (datediff(date_trunc("week", col("__ts")),
          date_trunc("week", col("__first_ts"))) / 7).cast("int")
          .as("week_offset"),
        col("__u"))
      .distinct()
    val grid = active.groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
    val byCohort = Window.partitionBy(col("cohort_week"))
    grid
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(byCohort))
      .withColumn("retention", graft.ops.Ops.roundDet(
        col("n_active").cast("double") / col("cohort_size"), 4))
      .select("cohort_week", "week_offset", "n_active", "cohort_size",
        "retention")
      .orderBy("cohort_week", "week_offset")
  }
}
