package graft.meta

/** Timed stage logging — the Spark mirror of the reference's logging
  * util (src/utils/logging.py:5-28, used by
  * src/incremental_ingestion.py:26-62): every pipeline stage logs a
  * start line and a completion line with its wall-clock duration, to
  * console and optionally to a log file. Driver-side observability
  * only — it never touches the data plane, so it costs nothing at any
  * scale.
  */
final class StageLog(logFile: Option[java.nio.file.Path] = None) {

  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(java.time.ZoneOffset.UTC)

  def info(msg: String): Unit = {
    val line = s"${fmt.format(java.time.Instant.now())} [graft] $msg"
    println(line)
    logFile.foreach { p =>
      // a bare relative filename has no parent — nothing to create
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }

  /** Run `body` as a named stage: start line, completion line with
    * seconds, failure line (and rethrow) on error — the same shape the
    * reference's `timed` decorator logs. */
  def timed[T](stage: String)(body: => T): T = {
    info(s"$stage: started")
    val t0 = System.nanoTime()
    try {
      val r = body
      info(f"$stage: completed in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    } catch {
      case e: Throwable =>
        info(f"$stage: FAILED after ${(System.nanoTime() - t0) / 1e9}%.2f s: " +
          Option(e.getMessage).getOrElse(e.getClass.getName))
        throw e
    }
  }
}
