package graft.meta

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.Ops
import graft.schema.Schemas

/** PG `meta.status_enum` ('success','failed') as a Scala ADT
  * serialized to string — reference src/db_setup.py:110. */
sealed abstract class RunStatus(val value: String)
object RunStatus {
  case object Success extends RunStatus("success")
  case object Failed extends RunStatus("failed")
}

/** The meta layer: run ledger + quarantine, parquet-backed — the Spark
  * mirror of the reference's `meta` schema (src/db_setup.py:108-141;
  * SURVEY §2.10 C3, §2.3 J3).
  *
  * Layout under the warehouse root:
  * {{{
  *   meta/metadata_table/            append-only run ledger
  *   meta/invalid_records/           quarantine, partitioned by pickup_month
  * }}}
  * Quarantine is partitioned by month so the insert-if-absent anti-join
  * prunes to the months actually present in the incoming batch instead
  * of scanning the whole ever-growing table (SURVEY §7.5 risk 3) — the
  * 100 TB posture for ON CONFLICT DO NOTHING.
  */
final class MetaStore(spark: SparkSession, warehouse: String) {
  private val ledgerPath = s"$warehouse/meta/metadata_table"
  private val invalidPath = s"$warehouse/meta/invalid_records"

  /** Reference default watermark TIMESTAMP '2024-01-01'
    * (src/sql/bronze_incremental_load.sql:18-20). */
  val defaultWatermark: Timestamp = Timestamp.valueOf("2024-01-01 00:00:00")

  private def readOrEmpty(path: String, schema: StructType): DataFrame =
    if (MetaStore.pathExists(spark, path))
      spark.read.schema(schema).parquet(path)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  def ledger: DataFrame = readOrEmpty(ledgerPath, Schemas.metadataTable)

  def invalidRecords: DataFrame =
    readOrEmpty(invalidPath,
      Schemas.bronze.add("pickup_month", "string"))

  /** Quarantine restricted to the given months — the read carries a
    * partition-column predicate, so the parquet scan keeps a
    * `PartitionFilters: [pickup_month IN (…)]` entry and touches only
    * those month directories. Every anti-join against the quarantine
    * goes through here: the right side stays O(months-in-batch) as the
    * table grows, instead of re-scanning years of history per run
    * (SURVEY §7.5 risk 3). Locked by PlanSpec. */
  def invalidRecordsForMonths(months: Seq[String]): DataFrame =
    invalidRecords.filter(col("pickup_month").isin(months: _*))

  /** `COALESCE(MAX(last_load_date), '2024-01-01')` — A1/F1
    * (bronze_incremental_load.sql:18-20). One tiny scalar agg over the
    * ledger; the ledger stays kilobytes even after years of runs. */
  def watermark(): Timestamp =
    ledger.agg(max(col("last_load_date"))).first().get(0) match {
      case ts: Timestamp => ts
      case _ => defaultWatermark
    }

  /** Append one run row — C3 (bronze_incremental_load.sql:67-78). */
  def appendRun(lastLoadDate: Timestamp, status: RunStatus,
                runtimeSeconds: Double, errorMessage: Option[String]): Unit = {
    val row = Row(lastLoadDate, status.value, runtimeSeconds,
      errorMessage.orNull)
    spark.createDataFrame(
        java.util.List.of(row), Schemas.metadataTable)
      .write.mode("append").parquet(ledgerPath)
  }

  /** Quarantine out-of-window rows with ON-CONFLICT-DO-NOTHING
    * semantics on the 7-column composite key — J3
    * (bronze_incremental_load.sql:46-62; key src/db_setup.py:129-137).
    *
    * The anti-join right side is restricted to the quarantine months
    * present in the incoming batch (partition-pruned scan), and the
    * incoming batch is itself key-deduplicated first so one batch
    * cannot insert the same key twice. */
  def quarantine(outOfWindow: DataFrame): Long = {
    val withMonth = outOfWindow.withColumn("pickup_month",
      date_format(col("tpep_pickup_datetime"), "yyyy-MM"))
    val batch = Ops.dedupFirst(withMonth, Schemas.invalidRecordsKey,
      Seq(col("tpep_dropoff_datetime"), col("fare_amount")))
    // Distinct months in the batch: a map-side-combined agg that
    // returns a handful of values (out-of-window rows cluster around
    // the window edges), bought once so the anti-join's quarantine
    // scan is partition-pruned instead of full.
    val months = batch.select("pickup_month").distinct()
      .collect().map(_.getString(0)).toSeq
    val fresh = Ops.insertIfAbsent(batch, invalidRecordsForMonths(months),
      Schemas.invalidRecordsKey, broadcastExisting = true)
    val n = fresh.count()
    if (n > 0)
      fresh.write.mode("append").partitionBy("pickup_month")
        .parquet(invalidPath)
    n
  }
}

object MetaStore {
  /** Existence probe through the Hadoop FileSystem API, so the
    * warehouse can live on any supported filesystem (file://, hdfs://,
    * s3a://, …) — `java.io.File` silently answered false for every
    * non-local URI, making a remote warehouse look forever empty. */
  private[graft] def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
