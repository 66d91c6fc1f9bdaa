package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.ops.Ops

/** Structured Streaming surface (extension — the reference is strictly
  * batch, SURVEY §2.8; its incremental month loop maps naturally onto
  * a file-source stream with Trigger.AvailableNow, and its watermark
  * column onto withWatermark).
  */
object StreamingOps {

  /** Run `body` with `spark.sql.shuffle.partitions` pinned low,
    * restoring the session default after. Stateful micro-batches
    * checkpoint one state store per shuffle partition — at the
    * session's 32 that fixed tax dwarfs the actual work on a replayed
    * file, so every finite streaming query here runs under this pin
    * (the value is baked into the stream's checkpoint anyway). */
  private[streaming] def withFewShufflePartitions[T](
      spark: SparkSession, n: Int = 4)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** events.parquet schema for the streaming reader. The fixture has
    * shipped `ts` in two physical forms (see graft.queries.Q.t):
    * TIMESTAMP(NANOS), readable only as raw longs under nanosAsLong,
    * and plain microsecond TIMESTAMP (isAdjustedToUTC=false → Spark
    * TIMESTAMP_NTZ). The file stream source needs the schema up
    * front, so probe the batch footer once (metadata-only, no data
    * read) and declare whichever ts type the file actually carries;
    * [[normalizeEventsTs]] then maps either to session-zone
    * TimestampType downstream. */
  private[streaming] def eventsRawSchema(spark: SparkSession,
                                         sfDir: String): StructType = {
    val tsType = spark.read.parquet(s"$sfDir/events.parquet")
      .schema("ts").dataType
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  /** Streaming twin of [[graft.queries.Q.normalizeEventsTs]]. */
  private[streaming] def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // TIMESTAMP_NS read as raw nanos
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // microsecond TIMESTAMP, naive
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Tumbling-window aggregation over the events table, executed as a
    * genuine streaming query: file source → event-time watermark →
    * window(ts) grouped aggregate → in-memory sink, driven to
    * completion with AvailableNow (the batch-parity trigger). Returns
    * the finished result, identical to the equivalent batch GROUP BY
    * date_trunc — which is exactly what the DuckDB oracle checks.
    *
    * Complete output mode: every window is emitted at end-of-stream
    * (append mode would withhold windows newer than the watermark
    * horizon, which can never close on a finite replay).
    */
  def tumblingEventCounts(spark: SparkSession, sfDir: String,
                          windowDuration: String = "1 day"): DataFrame =
    tumblingWindows(spark, sfDir, windowDuration, "complete",
      "graft_stream_tumbling")

  /** Append-mode twin of [[tumblingEventCounts]] — the production
    * form for sinks that cannot rewrite rows (files, topics): a
    * window is emitted ONCE, when the event-time watermark passes its
    * end, and windows still open at end-of-replay stay unemitted.
    * On the finite replay that means every window whose end the final
    * watermark (max ts − 1 h) has passed — exactly the filter the
    * DuckDB oracle applies to the batch result. (The emission relies
    * on the no-data final micro-batch AvailableNow runs after the
    * last file batch, which advances the watermark and flushes
    * closed windows.) */
  def tumblingEventCountsAppend(spark: SparkSession, sfDir: String,
                                windowDuration: String = "1 day"): DataFrame =
    tumblingWindows(spark, sfDir, windowDuration, "append",
      "graft_stream_tumbling_append")

  private def tumblingWindows(spark: SparkSession, sfDir: String,
                              windowDuration: String, mode: String,
                              sinkName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withFewShufflePartitions(spark) {

    // the file stream source requires a directory: point it at the sf
    // dir and glob-filter down to the events table
    val stream = spark.readStream
      .schema(eventsRawSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .transform(normalizeEventsTs)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           Ops.sumMoney(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("sum_value"))

    val q = stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(sinkName).orderBy("window_start", "event_type")

    }
  }

  /** Bounded-state streaming dedup — the production form of
    * [[streamingDedupKeys]]. `dropDuplicates` keeps one state row per
    * key forever; `dropDuplicatesWithinWatermark` evicts a key's state
    * once the watermark passes its event time + delay, so state holds
    * ~delay's worth of keys regardless of stream age.
    *
    * The eviction is only sound when every duplicate pair of a key is
    * closer together than the delay — here that is a property of the
    * key itself: it includes the event's calendar day, so duplicates
    * are < 24 h apart by construction and the 2-day delay covers every
    * pair. That makes the completed replay equal batch
    * `DISTINCT (user_id, event_type, day)` — which is what the DuckDB
    * oracle checks — while an infinite stream would hold only ~2 days
    * of keys in the state store. */
  def streamingDedupBounded(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sinkName = "graft_stream_dedup_wm"
    withFewShufflePartitions(spark) {

    val stream = spark.readStream
      .schema(eventsRawSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .transform(normalizeEventsTs)
      .withWatermark("ts", "2 days")
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("ts_day"), col("ts"))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "ts_day")
      .select("user_id", "event_type", "ts_day")

    val q = stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(sinkName).orderBy("user_id", "event_type", "ts_day")

    }
  }

  /** Stream-stream event-time interval join — the attribution staple
    * (impression → click within N minutes) and the one join family
    * batch joins can't replace on live data. Two streams derived from
    * the replayed events file (even event_ids as "impressions", odd as
    * "clicks"), both watermarked, inner-joined on user_id with the
    * click constrained to [imp.ts, imp.ts + N min]. The time-range
    * predicate is what lets Spark bound the join state: each side's
    * rows are dropped once the other side's watermark passes their
    * latest possible match time.
    *
    * The replay uses a watermark delay covering the whole fixture span,
    * so no state eviction can race the (possibly multi-file,
    * unordered) file replay and the completed result equals the batch
    * interval join EXACTLY — which is what the DuckDB oracle checks.
    * A production deployment tightens the delay to its real disorder
    * bound (state then holds ~delay + interval of rows per side);
    * the bounded-state discipline itself is proven by st4. */
  def streamStreamIntervalJoin(spark: SparkSession, sfDir: String,
                               windowMinutes: Int = 10): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sinkName = "graft_stream_interval_join"
    withFewShufflePartitions(spark) {

    def side(parity: Int, prefix: String): DataFrame = spark.readStream
      .schema(eventsRawSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .transform(normalizeEventsTs)
      .filter(pmod(col("event_id"), lit(2)) === parity)
      .select(col("event_id").as(s"${prefix}_id"),
        col("user_id").as(s"${prefix}_user"), col("ts").as(s"${prefix}_ts"))
      .withWatermark(s"${prefix}_ts", "35 days")

    val joined = side(0, "imp").join(side(1, "click"),
      expr(s"""imp_user = click_user
               AND click_ts >= imp_ts
               AND click_ts <= imp_ts + interval $windowMinutes minutes"""))
      .select(col("imp_id"), col("click_id"),
        col("imp_user").as("user_id"), col("imp_ts"), col("click_ts"))

    val q = joined.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(sinkName).orderBy("imp_id", "click_id")

    }
  }

  /** Stream-stream LEFT OUTER interval join — [[streamStreamIntervalJoin]]
    * plus the semantics only a stateful streaming engine can provide:
    * an impression with NO click inside its attribution window is
    * still emitted (null-extended) — but only once the event-time
    * watermark proves no matching click can arrive anymore. A batch
    * left join gets that answer for free by seeing all data; a stream
    * must hold each impression in state until `watermark >
    * imp_ts + window`, then emit the null row exactly once.
    *
    * Replay determinism differs from st5's 35-day-delay trick on
    * purpose: a 1-hour delay means the final no-data micro-batch
    * (AvailableNow) advances the watermark to max(ts) − 1 h and
    * FLUSHES the unmatched rows — with a 35-day delay no null row
    * would ever emit on the fixture and left-outer would degenerate to
    * inner. Correctness still holds because the whole single-file
    * replay lands in micro-batch 1 while the watermark is still at
    * zero (nothing is ever late); the delay only gates the final
    * flush. The emitted set is: all matched pairs, plus every
    * unmatched impression whose window end the final watermark
    * (min of the two sides' max ts, − 1 h) has passed — exactly the
    * filter the DuckDB oracle applies to the batch left join.
    * Unmatched impressions younger than that stay in state unemitted,
    * as they must on a stream that could still receive their click. */
  def streamStreamLeftOuterJoin(spark: SparkSession, sfDir: String,
                                windowMinutes: Int = 10): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sinkName = "graft_stream_left_outer_join"
    withFewShufflePartitions(spark) {

    def side(parity: Int, prefix: String): DataFrame = spark.readStream
      .schema(eventsRawSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .transform(normalizeEventsTs)
      .filter(pmod(col("event_id"), lit(2)) === parity)
      .select(col("event_id").as(s"${prefix}_id"),
        col("user_id").as(s"${prefix}_user"), col("ts").as(s"${prefix}_ts"))
      .withWatermark(s"${prefix}_ts", "1 hour")

    val joined = side(0, "imp").join(side(1, "click"),
      expr(s"""imp_user = click_user
               AND click_ts >= imp_ts
               AND click_ts <= imp_ts + interval $windowMinutes minutes"""),
      "left_outer")
      .select(col("imp_id"), col("click_id"),
        col("imp_user").as("user_id"), col("imp_ts"), col("click_ts"))

    val q = joined.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(sinkName)
      .orderBy(col("imp_id"), col("click_id").asc_nulls_first)

    }
  }

  /** Streaming native session windows — the built-in operator twin of
    * [[StatefulSessions]]' flatMapGroupsWithState formulation (same
    * trade as batch w2 vs w3: explicit state machine vs declarative
    * API; session_window semantics — new session at gap ≥ 30 min,
    * end = last event + gap). Append mode: a session is emitted once,
    * when the event-time watermark passes its end; sessions still
    * open within (delay + gap) of stream end stay unemitted, exactly
    * the filter the oracle applies to the batch session_window
    * result. */
  def sessionWindowStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sinkName = "graft_stream_session_window"
    withFewShufflePartitions(spark) {

    val stream = spark.readStream
      .schema(eventsRawSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .transform(normalizeEventsTs)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           Ops.sumMoney(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

    val q = stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(sinkName).orderBy("user_id", "session_start")

    }
  }

  /** Streaming drift monitor — per-window PSI of the value
    * distribution against a static full-corpus reference: the
    * continuous form of [[graft.ext.Drift.psiBinned]], answering "is
    * TODAY's traffic drifting from the corpus we trained on" while
    * the stream runs, rather than at batch admission time.
    *
    * Structured Streaming allows one stateful aggregation per query,
    * so the split is: the STREAM owns the windowed (window, bin)
    * counts — the only corpus-sized, stateful work — and the PSI
    * arithmetic over the finished count table is a batch epilogue on
    * the sink (windows × bins rows, config-bounded; the same
    * bounded-table argument as psiBinned's bin join). Bins are
    * floor(value / width) · width — float floor is exact in both
    * engines, so the DuckDB oracle bins identically without the
    * double→long cast divergence (Spark truncates, DuckDB rounds).
    * Missing bins inside a window floor at `eps` exactly as in
    * psiBinned: a reference bin absent from a day's traffic is
    * maximal drift evidence, not a division error.
    *
    * Returns (window_start, bin, p_ref, p_win, psi_term) ordered. */
  def streamingDriftPsi(spark: SparkSession, sfDir: String,
                        width: Int = 20, windowDuration: String = "1 day",
                        eps: Double = 1e-4): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sinkName = "graft_stream_drift_psi"
    withFewShufflePartitions(spark) {

    def binOf(v: org.apache.spark.sql.Column) =
      (floor(v / width) * width).cast("long")

    // static reference: full-corpus bin shares (batch read of the
    // same table the stream replays)
    val refRaw = normalizeEventsTs(
      spark.read.schema(eventsRawSchema(spark, sfDir))
        .option("pathGlobFilter", "events.parquet").parquet(sfDir))
    val refBins = refRaw.select(binOf(col("value")).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("__n"))
    val refTotal = refBins.agg(sum(col("__n")).as("__t"))
    val ref = refBins.crossJoin(broadcast(refTotal))
      .select(col("bin"),
        (col("__n").cast("double") / col("__t").cast("double")).as("p_ref"))

    val stream = spark.readStream
      .schema(eventsRawSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .transform(normalizeEventsTs)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowDuration),
        binOf(col("value")).as("bin"))
      .agg(count(lit(1)).as("__n"))
      .select(col("window.start").as("window_start"), col("bin"), col("__n"))

    val q = stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // batch epilogue over the (windows × bins)-bounded sink table.
    // Per-window totals come from a window function, not a groupBy
    // re-joined onto the same memory-sink view — that self-join
    // carries the view's fixed attribute ids on both sides and fails
    // analysis with conflicting references
    val byWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
    val winShares = spark.table(sinkName)
      .withColumn("p_win", col("__n").cast("double") /
        sum(col("__n")).over(byWin).cast("double"))
      .select("window_start", "bin", "p_win")
    // every (window, reference bin) pair must appear — an absent bin
    // IS the drift signal — plus window-only bins via the outer join.
    // The window list derives from the BATCH read (a lineage disjoint
    // from the sink view, dodging the same self-join trap): complete
    // mode emits exactly the windows with ≥ 1 event. The batch side
    // uses the SAME window(ts, windowDuration) bucketing as the
    // stream — batch and streaming `window()` share tumbling-origin
    // alignment, so the frame keys match the sink for ANY duration,
    // not just "1 day"
    val frame = refRaw
      .select(window(col("ts"),
        windowDuration).getField("start").as("window_start"))
      .distinct().crossJoin(ref)
    val eps_ = lit(eps)
    frame.join(winShares, Seq("window_start", "bin"), "full_outer")
      .select(col("window_start"), col("bin"),
        graft.ops.Ops.roundDet(coalesce(col("p_ref"), lit(0.0)), 6)
          .as("p_ref"),
        graft.ops.Ops.roundDet(coalesce(col("p_win"), lit(0.0)), 6)
          .as("p_win"),
        greatest(coalesce(col("p_ref"), lit(0.0)), eps_).as("__p"),
        greatest(coalesce(col("p_win"), lit(0.0)), eps_).as("__q"))
      .withColumn("psi_term", graft.ops.Ops.roundDet(
        (col("__p") - col("__q")) * log(col("__p") / col("__q")), 4))
      .select("window_start", "bin", "p_ref", "p_win", "psi_term")
      .orderBy("window_start", "bin")

    }
  }

  /** Streaming exact dedup: `dropDuplicates` over the replayed event
    * stream — the stateful streaming twin of batch DISTINCT (W1), and
    * the building block of exactly-once ingestion from at-least-once
    * transports. Driven to completion the result equals the batch
    * DISTINCT over the same keys, which is exactly what the oracle
    * checks. State is one entry per distinct key, unbounded on an
    * infinite stream — production pairs this with
    * `dropDuplicatesWithinWatermark` to bound it
    * ([[streamingDedupBounded]]); the replay here is finite by
    * construction. */
  def streamingDedupKeys(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sinkName = "graft_stream_dedup"
    withFewShufflePartitions(spark) {

    val stream = spark.readStream
      .schema(eventsRawSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .transform(normalizeEventsTs)
      .select("user_id", "event_type")
      .dropDuplicates("user_id", "event_type")

    val q = stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(sinkName).orderBy("user_id", "event_type")

    }
  }

  /** Stream-static enrichment join — the standard "attach dimension
    * attributes to a live event stream" shape: the event stream joins
    * the static customer dimension per micro-batch and aggregates per
    * segment. The static side carries an explicit broadcast hint, so
    * each micro-batch plans a broadcast hash join and the stream side
    * never shuffles for the join — at 100 TB/day of events the only
    * shuffle is the segment-count aggregation, whose cardinality is
    * the dimension's, not the stream's. (StreamingSpec asserts
    * stream==batch parity; the hint is part of the plan every
    * micro-batch executes.) Complete output mode: the replay
    * is finite and every segment row is re-emitted at end-of-stream,
    * matching the batch join+group the DuckDB oracle runs. */
  def streamStaticEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sinkName = "graft_stream_enrich"
    withFewShufflePartitions(spark) {

    val dim = broadcast(spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment")))

    val stream = spark.readStream
      .schema(eventsRawSchema(spark, sfDir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .transform(normalizeEventsTs)
      .select(col("user_id"), col("value"))
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
           Ops.sumMoney(col("value")).as("sum_value"))

    val q = stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(sinkName).orderBy("c_mktsegment")

    }
  }
}
