package graft

import org.apache.spark.sql.SparkSession

import graft.meta.StageLog
import graft.silver.SilverRefresh

/** Warehouse bootstrap — the Spark mirror of `python src/db_setup.py`
  * (reference src/db_setup.py:59-77,281; SURVEY §3.3): drop and
  * recreate the warehouse layout, then seed the static dimension
  * tables the reference creates with inline VALUES. Completes the
  * reference's three entry points (setup / incremental ingest /
  * full pipeline run).
  *
  * The reference's `CREATE SCHEMA bronze/silver/gold/meta` +
  * `CREATE TABLE` DDL maps to the directory tree plus the shared
  * StructType registry (graft.schema.Schemas) — Spark tables carry
  * their schema in code and parquet footers, not a catalog server.
  */
object Setup {

  val Layers: Seq[String] = Seq("bronze", "silver", "gold", "meta")

  /** Drop (optional) and recreate the warehouse tree, seed static
    * dims. Runs through the Hadoop FileSystem API so the warehouse may
    * be any supported URI (file://, hdfs://, s3a://, …). */
  def setup(spark: SparkSession, warehouse: String,
            wipe: Boolean = true,
            log: StageLog = new StageLog()): Unit = {
    val root = new org.apache.hadoop.fs.Path(warehouse)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    log.timed("setup: warehouse tree") {
      if (wipe && fs.exists(root)) fs.delete(root, true)
      Layers.foreach(l =>
        fs.mkdirs(new org.apache.hadoop.fs.Path(s"$warehouse/$l")))
    }
    // the dims the reference seeds with inline VALUES at setup time
    // (db_setup.py: ratecode/payment lookup inserts)
    log.timed("setup: static dims") {
      new SilverRefresh(spark, warehouse).writeStaticDims()
    }
  }

  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption.getOrElse("/tmp/graft_warehouse")
    val spark = LocalSpark.session("graft-setup")
    setup(spark, warehouse)
    spark.stop()
  }
}
