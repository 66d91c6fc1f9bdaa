package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, ExtQueries, PipeQueries, Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: every operator of SURVEY.md §2 (core reference
  * parity) plus the training-data extension operators, each as a
  * `(SparkSession, sfDir) => DataFrame` over the driver testdata tables
  * with (where SQL-expressible) a DuckDB oracle producing the identical
  * result. Query keys embed the SURVEY §2 operator ids they cover.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    CoreQueries.all ++ ExtQueries.all ++ PipeQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The gold.vendor_metrics shape: fact × broadcast dim → group →
    * exact-sum/avg → ordered (reference src/sql/gold_aggregate_layer.sql:3-12). */
  def entry(spark: SparkSession): DataFrame =
    queries("j1_dim_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Collapse the Scala-source indentation of multiline SQL to single
    * spaces — cosmetic only, the driver JSON-escapes anyway. */
  private def normalize(sql: String): String =
    sql.replaceAll("\\s+", " ").trim
}
