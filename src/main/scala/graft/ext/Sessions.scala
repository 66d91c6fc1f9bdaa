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
}
