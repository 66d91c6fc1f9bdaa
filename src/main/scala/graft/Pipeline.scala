package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.bronze.BronzeIngest
import graft.gold.GoldViews
import graft.meta.MetaStore
import graft.silver.SilverRefresh
import graft.taxi.TaxiFixtures

/** End-to-end medallion pipeline — the Spark mirror of
  * `python src/etl_pipeline_run.py` (reference etl_pipeline_run.py:1-35;
  * SURVEY §3.1): month loop → bronze incremental ingest → silver full
  * refresh → gold aggregates, all in one SparkSession, with the run
  * ledger and quarantine maintained by [[graft.meta.MetaStore]].
  */
final class Pipeline(spark: SparkSession, warehouse: String) {
  val meta = new MetaStore(spark, warehouse)
  val bronzeLayer = new BronzeIngest(spark, warehouse, meta)
  val silverLayer = new SilverRefresh(spark, warehouse)
  val goldLayer = new GoldViews(spark, warehouse)

  /** The reference's month loop (etl_pipeline_run.py:19-20) — C1. Each
    * batch supplier stands in for the monthly HTTP parquet download. */
  def run(batches: Seq[() => DataFrame]): Unit = {
    batches.foreach(b => bronzeLayer.ingest(b()))
    silverLayer.refresh()
    goldLayer.build()
  }
}

/** Demo main: generates deterministic taxi fixtures for 2024-01..03 and
  * runs the full pipeline into a local warehouse directory. */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption.getOrElse("/tmp/graft_warehouse")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val p = new Pipeline(spark, warehouse)
    p.run((1 to 3).map(m => () => TaxiFixtures.monthBatch(spark, 2024, m)))

    println(s"=== ledger ===")
    p.meta.ledger.show(20, truncate = false)
    Seq("vendor_metrics", "monthly_metrics", "payment_metrics").foreach { g =>
      println(s"=== gold.$g ===")
      spark.read.parquet(s"$warehouse/gold/$g").show(20, truncate = false)
    }
    spark.stop()
  }
}
