package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Ops

/** Gold aggregate layer — the three BI views of the reference
  * (src/sql/gold_aggregate_layer.sql:1-38). The reference leaves these
  * lazy (`CREATE OR REPLACE VIEW`); we both register them as temp views
  * (lazy, like the reference) and materialize them to parquet
  * (BI-consumable, README.md:203 — SURVEY §2.1 S7).
  *
  * All three are fact × tiny broadcast dim → hash aggregate
  * (partial+final) → round → order: one shuffle each, no sort-merge
  * join anywhere, which is exactly the plan that survives a 100×
  * scale-up (SURVEY §2.3: every reference join is fact × tiny dim).
  */
final class GoldViews(spark: SparkSession, warehouse: String) {
  import GoldViews._

  private def read(p: String) = spark.read.parquet(s"$warehouse/silver/$p")

  def build(): Unit = {
    val fact = read("yellow_taxi")
    val gold = Seq(
      "vendor_metrics" -> vendorMetrics(fact, read("vendor")),
      "monthly_metrics" -> monthlyMetrics(fact),
      "payment_metrics" -> paymentMetrics(fact, read("payment_type")))
    gold.foreach { case (name, df) =>
      df.createOrReplaceTempView(s"gold_$name") // lazy, like the reference
      df.write.mode("overwrite").parquet(s"$warehouse/gold/$name")
    }
  }
}

object GoldViews {

  /** gold.vendor_metrics (reference gold_aggregate_layer.sql:3-12):
    * LEFT JOIN vendor dim, group by vendor name (NULL key kept — A7),
    * count/sum/rounded-avg, revenue-descending. */
  def vendorMetrics(fact: DataFrame, vendor: DataFrame): DataFrame =
    fact.join(broadcast(vendor), Seq("vendorid"), "left")
      .groupBy("vendor")
      .agg(count(lit(1)).as("total_trips"),
           Ops.sumMoney(col("total_amount")).as("total_revenue"),
           Ops.avgMoney(col("minute_duration")).as("avg_trip_duration"))
      .orderBy(desc("total_revenue"))

  /** gold.monthly_metrics (reference gold_aggregate_layer.sql:15-23):
    * group by month name of pickup (computed key — A5/F4). */
  def monthlyMetrics(fact: DataFrame): DataFrame =
    fact.groupBy(Ops.monthName(col("tpep_pickup_datetime")).as("month"))
      .agg(count(lit(1)).as("total_rides"),
           Ops.avgMoney(col("minute_duration")).as("avg_duration"),
           Ops.avgMoney(col("trip_distance")).as("avg_distance"))
      .orderBy(desc("total_rides"))

  /** gold.payment_metrics (reference gold_aggregate_layer.sql:29-38). */
  def paymentMetrics(fact: DataFrame, paymentType: DataFrame): DataFrame =
    fact.join(broadcast(paymentType),
        fact("payment_type") === paymentType("payment_type_id"), "left")
      .groupBy(paymentType("payment_type"))
      .agg(count(lit(1)).as("total_trip_by_payment"),
           Ops.avgMoney(col("trip_distance")).as("avg_trip_distance"),
           Ops.avgMoney(col("minute_duration")).as("avg_trip_duration"))
      .orderBy(desc("total_trip_by_payment"))
}
