package graft.schema

import org.apache.spark.sql.types._

/** Fixed, DDL-declared schemas for every warehouse layer — the Spark
  * mirror of the reference's CREATE TABLE statements (reference
  * src/db_setup.py; SURVEY.md §1). Never rely on schema inference:
  * every scan asserts one of these StructTypes.
  */
object Schemas {

  /** bronze.yellow_taxi_raw — reference src/db_setup.py:80-101.
    * `passenger_count` and `ratecodeid` deliberately stay text in
    * bronze (raw files contain NULLs/floats) and are recast in silver
    * (SURVEY §1.2). */
  val bronze: StructType = StructType(Seq(
    StructField("vendorid", IntegerType),
    StructField("tpep_pickup_datetime", TimestampType),
    StructField("tpep_dropoff_datetime", TimestampType),
    StructField("passenger_count", StringType),
    StructField("trip_distance", DoubleType),
    StructField("ratecodeid", StringType),
    StructField("store_and_fwd_flag", StringType),
    StructField("pulocationid", IntegerType),
    StructField("dolocationid", IntegerType),
    StructField("payment_type", IntegerType),
    StructField("fare_amount", DoubleType),
    StructField("extra", DoubleType),
    StructField("mta_tax", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("tolls_amount", DoubleType),
    StructField("improvement_surcharge", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("congestion_surcharge", DoubleType),
    StructField("airport_fee", DoubleType)))

  /** The 19 bronze column names, in declaration order. */
  val bronzeCols: Seq[String] = bronze.fields.map(_.name).toIndexedSeq

  /** Composite key of meta.invalid_records — reference
    * src/db_setup.py:129-137. Drives the insert-if-absent quarantine
    * dedup (ON CONFLICT DO NOTHING → left-anti join). */
  val invalidRecordsKey: Seq[String] = Seq(
    "vendorid", "tpep_pickup_datetime", "tpep_dropoff_datetime",
    "trip_distance", "pulocationid", "dolocationid", "total_amount")

  /** silver.yellow_taxi — reference src/db_setup.py:184-207: bronze
    * columns with ratecodeid/payment_type recast to int plus the
    * derived minute_duration. The `pickup_month` partition column
    * (yyyy-MM) mirrors the reference's 12 monthly RANGE partitions
    * (src/db_setup.py:210-271) as Hive-style directory partitioning. */
  val silverFact: StructType = StructType(
    bronze.fields.map {
      case f if f.name == "ratecodeid" => f.copy(dataType = IntegerType)
      case f => f
    }.toIndexedSeq :+
      StructField("minute_duration", IntegerType) :+
      StructField("pickup_month", StringType))

  /** silver.vendor — reference src/db_setup.py:151-156. */
  val vendorDim: StructType = StructType(Seq(
    StructField("vendorid", IntegerType),
    StructField("vendor", StringType)))

  /** silver.payment_type — reference src/db_setup.py:162-167. */
  val paymentTypeDim: StructType = StructType(Seq(
    StructField("payment_type_id", IntegerType),
    StructField("payment_type", StringType)))

  /** silver.ratecode — reference src/db_setup.py:173-178. */
  val ratecodeDim: StructType = StructType(Seq(
    StructField("ratecodeid", IntegerType),
    StructField("rate", StringType)))

  /** meta.metadata_table — reference src/db_setup.py:115-121. The PG
    * `status_enum` becomes a string constrained in code
    * ([[graft.meta.RunStatus]]); `runtime INTERVAL` becomes seconds
    * as double (SURVEY §1.3). */
  val metadataTable: StructType = StructType(Seq(
    StructField("last_load_date", TimestampType),
    StructField("status", StringType),
    StructField("runtime_seconds", DoubleType),
    StructField("error_message", StringType)))
}
