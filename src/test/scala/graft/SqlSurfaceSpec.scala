package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.bronze.Sources
import graft.functions.GraftFunctions

/** SQL-surface tests: custom expressions callable from spark.sql, the
  * extensions entry point, and the reference's ported URL test. */
class SqlSurfaceSpec extends SparkTestBase {
  import spark.implicits._

  test("custom expressions callable from SQL after register()") {
    GraftFunctions.register(spark)
    Seq((Array(1.0, 0.0), Array(1.0, 0.0)), (Array(1.0, 0.0), Array(0.0, 1.0)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT cosine_sim(a, b) AS c FROM vecs ORDER BY c")
      .as[Double].collect().toSeq
    assert(got == Seq(0.0, 1.0))

    val sh = spark.sql(
      "SELECT simhash64(array('spark', 'catalyst', 'rules')) AS h")
      .as[Long].head()
    assert(sh != 0L)
  }

  test("GraftExtensions injects the function builders") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val fns = org.apache.spark.sql.graftshim.ColumnShim.buildRegistry(ext)
    Seq("cosine_sim", "simhash64", "minhash_sig", "minhash_bands",
      "byte_stats").foreach { n =>
      assert(fns.functionExists(FunctionIdentifier(n)), n)
    }
    val rules = org.apache.spark.sql.graftshim.ColumnShim
      .buildOptimizerRules(ext, spark)
    assert(rules.contains(graft.plans.BucketedRangeJoinRule),
      "extensions must inject the range-join rewrite rule")
  }

  test("download URL template (parity with reference test_download_url.py)") {
    assert(Sources.downloadUrl(2024, 1) ==
      "https://d37ci6vzurychx.cloudfront.net/trip-data/yellow_tripdata_2024-01.parquet")
    assert(Sources.downloadUrl(2024, 12).endsWith("yellow_tripdata_2024-12.parquet"))
  }
}
