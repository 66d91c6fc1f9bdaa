package graft.bronze

/** Source-location helpers — the Spark mirror of the reference's
  * download URL templating (src/incremental_ingestion.py:14-20,
  * SURVEY §2.7 F11). The actual HTTP fetch happens outside Spark (or
  * via a hadoop-fs http filesystem on a real cluster); the engine
  * reads whatever parquet lands in the staging location.
  */
object Sources {

  /** Base URL of the public NYC TLC trip-record data (same constant
    * as reference src/incremental_ingestion.py:14). */
  val BaseUrl = "https://d37ci6vzurychx.cloudfront.net/trip-data"

  /** Monthly yellow-taxi parquet URL, zero-padded month — parity with
    * the reference's only unit test (test/test_download_url.py:13-15). */
  def downloadUrl(year: Int, month: Int): String =
    f"$BaseUrl/yellow_tripdata_$year%04d-$month%02d.parquet"
}
