package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Table-maintenance operations. Incremental pipelines accrete small
  * files — every micro-batch/month append writes its own parquet
  * part — and at 100 TB the file count, not the byte count, becomes
  * the scan bottleneck (driver-side listing, task-per-file scheduling,
  * footer overhead). Compaction rewrites a partitioned table with one
  * shuffle keyed on the partition column and swaps it in atomically.
  */
object Maintenance {

  /** Rewrite `path` (a `partitionBy(partitionCol)` parquet table) with
    * its small files merged: one shuffle clusters rows by partition,
    * `maxRecordsPerFile` caps output file size, and the result
    * replaces the original via rename (write-stage-swap — readers of
    * the old tree are unaffected until the swap, and a crash before
    * the swap leaves the original intact).
    *
    * Returns (files before, files after). */
  def compactPartitioned(spark: SparkSession, path: String,
                         partitionCol: String,
                         maxRecordsPerFile: Long = 5000000L): (Long, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetCount(root: Path): Long = {
      val it = fs.listFiles(root, true)
      var n = 0L
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    val before = parquetCount(p)

    val staging = new Path(p.getParent, p.getName + "__compacting")
    fs.delete(staging, true)
    spark.read.parquet(path)
      .repartition(col(partitionCol)) // cluster rows by target partition
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(staging.toString)

    val retired = new Path(p.getParent, p.getName + "__retired")
    fs.delete(retired, true)
    if (!fs.rename(p, retired))
      throw new java.io.IOException(s"compact: could not retire $p")
    if (!fs.rename(staging, p)) {
      fs.rename(retired, p) // roll back
      throw new java.io.IOException(s"compact: could not swap in $staging")
    }
    fs.delete(retired, true)
    (before, parquetCount(p))
  }
}
