package graft.bronze

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.{MetaStore, RunStatus}
import graft.ops.Ops
import graft.schema.Schemas

/** Result of one incremental load, mirroring what the reference logs
  * (src/incremental_ingestion.py:55-70). */
final case class IngestResult(loaded: Long, quarantined: Long,
                              watermark: Timestamp, seconds: Double)

/** Incremental bronze load — the Spark re-expression of the PL/pgSQL
  * stored procedure `bronze.incremental_load()`
  * (reference src/sql/bronze_incremental_load.sql:1-81; SURVEY §3.2).
  *
  * Semantics implemented (the documented contract, README.md:148-153):
  * rows strictly newer than the high-water-mark that fall inside the
  * batch's calendar month are appended to bronze; newer rows outside
  * that month are quarantined with key-dedup; the watermark is then
  * recomputed from bronze itself so re-runs are no-ops (idempotency,
  * README.md:166-173). Divergence, documented per SURVEY §7.5-4: the
  * reference derives the month window from the *previous watermark's*
  * month (bronze_incremental_load.sql:22-24 — an acknowledged accident;
  * the sql:7 comment and README.md:145-147 describe the original
  * design), which lags ingestion one month behind the file being
  * loaded. We derive it from the incoming batch's earliest new pickup,
  * which is the behavior the README documents.
  *
  * Scale posture: one scan of the incoming batch feeds both the
  * in-window append and the quarantine split (Ops.windowSplit);
  * bronze is partitioned by pickup_month so the watermark recompute
  * (A2) and all downstream month-ranged reads prune partitions; the
  * quarantine anti-join is broadcast + month-pruned (MetaStore).
  */
final class BronzeIngest(spark: SparkSession, warehouse: String,
                         meta: MetaStore) {
  private val bronzePath = s"$warehouse/bronze/yellow_taxi_raw"

  def bronze: DataFrame =
    if (MetaStore.pathExists(spark, bronzePath))
      spark.read.schema(Schemas.bronze.add("pickup_month", "string"))
        .parquet(bronzePath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Schemas.bronze.add("pickup_month", "string"))

  /** Load one monthly batch (the reference's staged `raw_stage` temp
    * table, src/incremental_ingestion.py:35-52, arrives here as a
    * DataFrame). Returns counts + the new watermark; appends a ledger
    * row in all cases and rethrows on failure (C2/C3,
    * bronze_incremental_load.sql:67-79). */
  def ingest(batch: DataFrame): IngestResult = {
    val t0 = System.nanoTime()
    try {
      val lld = meta.watermark()

      // "New" = newer than the watermark AND not already quarantined.
      // Without the anti-join, a re-run would see last run's
      // quarantined stragglers as the start of a fresh month and load
      // them — breaking idempotency (C4). The PG reference gets this
      // for free from the invalid_records composite PK; our analog is
      // the same left-anti join used for ON CONFLICT (J3), against the
      // small (broadcast) quarantine table.
      val candidates =
        batch.filter(col("tpep_pickup_datetime") > lit(lld))
      // Months spanned by the candidates — a map-side-combined
      // distinct over one or two values per monthly batch — so the
      // anti-join below reads only those quarantine partitions
      // (PartitionFilters, locked by PlanSpec) instead of the whole
      // ever-growing table.
      val candMonths = candidates
        .select(date_format(col("tpep_pickup_datetime"), "yyyy-MM")
          .as("pickup_month"))
        .distinct().collect().map(_.getString(0)).toSeq
      val newRows = Ops.insertIfAbsent(
        candidates, meta.invalidRecordsForMonths(candMonths),
        Schemas.invalidRecordsKey, broadcastExisting = true)

      // Window = calendar month of the earliest new row in the batch
      // (min is a cheap scalar agg on the already-staged batch).
      val minNew = newRows
        .agg(min(col("tpep_pickup_datetime"))).first().get(0)
      val result = minNew match {
        case null => // nothing newer than the watermark: idempotent no-op
          IngestResult(0L, 0L, lld, 0.0)
        case ts: Timestamp =>
          val winStart = date_trunc("month", lit(ts))
          val winEnd = add_months(winStart, 1)
          val (inWin, outWin) = Ops.windowSplit(
            newRows, "tpep_pickup_datetime", lit(lld), winStart, winEnd)

          val loaded = inWin.count()
          if (loaded > 0)
            inWin.withColumn("pickup_month",
                date_format(col("tpep_pickup_datetime"), "yyyy-MM"))
              .write.mode("append").partitionBy("pickup_month")
              .parquet(bronzePath)
          val quarantined = meta.quarantine(outWin)

          // Recompute the watermark from bronze *contents* within the
          // window — not from the batch — so partial failures re-run
          // cleanly (C4, bronze_incremental_load.sql:64-65). The
          // pickup_month filter makes this a partition-pruned scan.
          // The key is rendered in the SESSION timezone — the same
          // zone date_format used to write the pickup_month partition
          // values (SimpleDateFormat used the JVM default zone, which
          // silently diverges on non-UTC hosts).
          val monthKey = java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM")
            .withZone(java.time.ZoneId.of(
              spark.sessionState.conf.sessionLocalTimeZone))
            .format(ts.toInstant)
          val wm = bronze.filter(col("pickup_month") === monthKey)
            .agg(max(col("tpep_pickup_datetime"))).first().get(0) match {
              case t: Timestamp => t
              case _ => lld
            }
          IngestResult(loaded, quarantined, wm, 0.0)
      }
      val secs = (System.nanoTime() - t0) / 1e9
      meta.appendRun(result.watermark, RunStatus.Success, secs, None)
      result.copy(seconds = secs)
    } catch {
      case e: Throwable =>
        val secs = (System.nanoTime() - t0) / 1e9
        meta.appendRun(meta.defaultWatermark, RunStatus.Failed, secs,
          Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        throw e
    }
  }
}
