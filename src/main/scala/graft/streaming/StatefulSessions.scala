package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** One event entering the sessionizer. */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** One closed (or final) session leaving it. `sum_value` is an exact
  * decimal (encoder emits DecimalType(38,18)); callers round it to
  * the compared DOUBLE — floats never ACCUMULATE (order-sensitive),
  * they only carry the final rounded value. */
final case class UserSession(user_id: Long, session_id: Long,
                             session_start: Timestamp, session_end: Timestamp,
                             n_events: Long, sum_value: java.math.BigDecimal)

/** Open-session state carried between micro-batches. Timestamps in
  * MICROseconds (java.sql.Timestamp.getTime would truncate to ms and
  * break bit-parity with the batch sessionizer). `sum` is an exact
  * decimal at scale 10 — decimal addition is associative and
  * commutative, so the accumulated total is independent of event
  * arrival order across micro-batches (raw-double accumulation was
  * order-sensitive and broke run-to-run hash reproducibility). */
final case class SessionState(sessionId: Long, start: Long, end: Long,
                              n: Long, sum: java.math.BigDecimal)

/** Custom streaming state: gap-based sessionization with
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset stateful API
  * the reference has no analog for (SURVEY §2.8: streaming is an
  * extension). Sessions close when the inactivity gap exceeds
  * `gapMinutes`; closed sessions are emitted as they close, and the
  * still-open session is emitted at event-time timeout.
  *
  * StatefulSessionsSpec asserts this produces exactly the same
  * sessions as the batch formulation (graft.ext.Sessions) when the
  * stream is replayed to completion — the batch/streaming parity that
  * makes the operator trustworthy in both modes.
  */
object StatefulSessions {

  def sessionizeStream(events: Dataset[SessionEvent], gapMinutes: Int)
      : Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, it, state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // end of stream (watermark passed): flush the open session
            val out = state.getOption.toList.flatten.map(toSession(userId, _))
            state.remove()
            out.iterator
          } else {
            // total order: ts, then value as a tie-break for equal-ts
            // events — batch arrival order never influences the result
            val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.value))
            var open = state.getOption.toList.flatten.headOption
            var nextId = open.map(_.sessionId + 1).getOrElse(0L)
            val closed = List.newBuilder[UserSession]
            sorted.foreach { e =>
              val t = micros(e.ts)
              open match {
                case Some(s) if t - s.end <= gapUs =>
                  open = Some(s.copy(end = math.max(s.end, t), n = s.n + 1,
                    sum = s.sum.add(dec10(e.value))))
                case Some(s) =>
                  closed += toSession(userId, s)
                  open = Some(SessionState(nextId, t, t, 1L, dec10(e.value)))
                  nextId += 1
                case None =>
                  open = Some(SessionState(nextId, t, t, 1L, dec10(e.value)))
                  nextId += 1
              }
            }
            open.foreach { s =>
              state.update(List(s))
              // time out (and flush) once the watermark passes the gap
              // (timeout API is ms-based)
              state.setTimeoutTimestamp(s.end / 1000 + gapMinutes * 60000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Exact decimal twin of Spark's `cast(v AS DECIMAL(28,10))`:
    * shortest-string double expansion (BigDecimal.valueOf), then
    * HALF_UP to scale 10 — bit-identical to what the batch
    * sessionizer's sumMoneyDec feeds its decimal SUM. */
  private def dec10(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)

  private def micros(t: Timestamp): Long =
    org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)

  private def fromMicros(us: Long): Timestamp =
    org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(us)

  private def toSession(userId: Long, s: SessionState): UserSession =
    UserSession(userId, s.sessionId, fromMicros(s.start),
      fromMicros(s.end), s.n, s.sum)

  /** Run the sessionizer over the events table as a replayed stream,
    * to completion, returning the collected sessions. */
  def replayEvents(spark: SparkSession, sfDir: String, gapMinutes: Int)
      : DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sinkName = "graft_sessions_sink"

    StreamingOps.withFewShufflePartitions(spark) {

    val events = spark.readStream
      .schema(StreamingOps.eventsRawSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .transform(StreamingOps.normalizeEventsTs)
      .withWatermark("ts", "1 minute")
      .select("user_id", "ts", "value")
      .as[SessionEvent]

    val q = sessionizeStream(events, gapMinutes = gapMinutes)
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // exact decimal state → double → portable 2dp round, emitted as
    // DOUBLE (same emission route as Ops.sumMoney — see its scaladoc
    // for why DOUBLE is the only compared money type)
    spark.table(sinkName)
      .withColumn("sum_value",
        graft.ops.Ops.roundDet(col("sum_value").cast("double"), 2))

    }
  }
}
