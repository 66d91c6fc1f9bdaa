package graft.bronze

/** Source acquisition — the Spark mirror of the reference's download
  * stage (src/incremental_ingestion.py:14-30, SURVEY §2.7 F11): URL
  * templating plus a streamed fetch into a local staging file that the
  * engine then reads as parquet.
  */
object Sources {

  /** Base URL of the public NYC TLC trip-record data (same constant
    * as reference src/incremental_ingestion.py:14). */
  val BaseUrl = "https://d37ci6vzurychx.cloudfront.net/trip-data"

  /** Monthly yellow-taxi parquet URL, zero-padded month — parity with
    * the reference's only unit test (test/test_download_url.py:13-15). */
  def downloadUrl(year: Int, month: Int): String =
    downloadUrl(BaseUrl, year, month)

  /** Same template against any base (a `file://` fixture dir in
    * tests, a mirror in production). */
  def downloadUrl(base: String, year: Int, month: Int): String =
    f"$base/yellow_tripdata_$year%04d-$month%02d.parquet"

  /** A transport: (url, destination file) => (). Swappable so tests
    * and air-gapped environments can fetch `file://` URLs with the
    * same pipeline code that streams HTTPS in production. */
  type Fetcher = (String, java.nio.file.Path) => Unit

  /** Default transport: stream the URL to the destination — the
    * direct analog of the reference's chunked `requests.get(...,
    * stream=True)` loop (incremental_ingestion.py:21-30). Handles any
    * scheme the JDK has a protocol handler for (https, file, …). */
  val urlFetcher: Fetcher = (url, dest) => {
    val in = java.net.URI.create(url).toURL.openStream()
    try java.nio.file.Files.copy(in, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
  }

  /** Fetch `url` into `stagingDir` (kept file name), returning the
    * staged path. The download is driver-side and month-sized by
    * construction (one monthly file), so it never bottlenecks the
    * cluster — the heavy lifting starts at the parquet scan. */
  def fetch(url: String, stagingDir: String,
            fetcher: Fetcher = urlFetcher): String = {
    val name = url.substring(url.lastIndexOf('/') + 1)
    val dir = java.nio.file.Paths.get(stagingDir)
    java.nio.file.Files.createDirectories(dir)
    val dest = dir.resolve(name)
    fetcher(url, dest)
    dest.toString
  }
}
