package graft

import java.nio.file.Files

import graft.taxi.TaxiFixtures

/** Exact golden lock of the gold layer over the deterministic taxi
  * fixtures (FIXTURES.md §B): the full medallion run must reproduce
  * these values bit-for-bit. Semantics are independently validated by
  * the DuckDB oracle queries; this spec locks the pipeline against
  * regressions (any generator/operator change that alters results
  * fails loudly here). */
class GoldenSpec extends SparkTestBase {
  import spark.implicits._

  test("gold tables match golden values exactly") {
    val wh = Files.createTempDirectory("graft_golden_").toString
    val p = new Pipeline(spark, wh)
    p.run((1 to 3).map(m => () => TaxiFixtures.monthBatch(spark, 2024, m)))

    val vm = spark.read.parquet(s"$wh/gold/vendor_metrics")
      .as[(Option[String], Long, Double, Double)].collect().toSeq
    assert(vm == Seq(
      (Some("Myle Technologies Inc"), 1238L, 76063.96, 45.13),
      (Some("Helix"), 1212L, 75765.48, 44.52),
      (None, 1190L, 73604.99, 45.88),
      (Some("Creative Mobile Technologies, LLC"), 1188L, 73591.98, 45.16),
      (Some("Curb Mobility, LLC"), 1172L, 73366.06, 42.65)))

    val mm = spark.read.parquet(s"$wh/gold/monthly_metrics")
      .as[(String, Long, Double, Double)].collect().toSeq
      .sortBy(_._1) // equal total_rides: lock values, not tie order
    assert(mm == Seq(
      ("February", 2000L, 45.1, 10.06),
      ("January", 2000L, 44.46, 9.98),
      ("March", 2000L, 44.47, 9.92)))

    val pm = spark.read.parquet(s"$wh/gold/payment_metrics")
      .as[(Option[String], Long, Double, Double)].collect().toSeq
      .sortBy(r => (-r._2, r._1.getOrElse(""))) // ties on count: lock values
    assert(pm == Seq(
      (Some("Credit card"), 786L, 9.99, 45.61),
      (None, 765L, 10.12, 46.99),
      (Some("Flex Fare trip"), 763L, 9.71, 43.3),
      (Some("Cash"), 752L, 10.21, 45.42),
      (Some("No charge"), 752L, 9.89, 44.11),
      (Some("Unknown"), 730L, 10.07, 43.37),
      (Some("Voided trip"), 730L, 10.0, 44.04),
      (Some("Dispute"), 722L, 9.87, 44.45)))
  }
}
