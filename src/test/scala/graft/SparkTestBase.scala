package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test harness: one lazy SparkSession per suite, configured
  * like the driver's Verify session (UTC, small shuffle partitions). */
trait SparkTestBase extends AnyFunSuite {
  // lazy val (not def): `import spark.implicits._` needs a stable
  // identifier. Bound per suite instance, so a suite that starts
  // after a context death gets the rebuilt session below.
  lazy val spark: SparkSession = SparkTestBase.session
  def sf001 = "/root/testdata/sf0.001"
}

object SparkTestBase {
  // One session per JVM: suites share it so `sbt test` doesn't pay
  // session startup per suite. NOT a lazy val: if the shared context
  // dies mid-run (e.g. a memory-pressure shutdown under a tight
  // driver budget), every later suite would otherwise fail with
  // "SparkContext has been shutdown" — rebuild it instead so one
  // casualty cannot cascade across the whole run.
  @volatile private var cached: SparkSession = _

  def session: SparkSession = synchronized {
    if (cached == null || cached.sparkContext.isStopped) {
      if (cached != null)
        org.apache.spark.sql.SparkSession.clearActiveSession()
      cached = SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft_wh_test_")
            .toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      cached.sparkContext.setLogLevel("WARN")
    }
    cached
  }
}
