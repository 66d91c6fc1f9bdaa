package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Morton (Z-order) interleave of integral columns, each min-max
    * normalized to `bits` bits against the supplied global bounds.
    * Pure codegen'd bit arithmetic (shift/and/or planes) — no UDF.
    * Columns beyond their stated bounds are clamped, a degenerate
    * (min == max) column contributes constant 0. */
  def zorderValue(cols: Seq[Column], mins: Seq[Column], maxs: Seq[Column],
                  bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 2, s"z-order needs >= 2 columns, got $n")
    require(bits * n <= 62, s"$n cols x $bits bits overflow a signed long")
    val top = (1L << bits) - 1
    val norm = cols.lazyZip(mins).lazyZip(maxs).map { (c, lo, hi) =>
      val span = hi.cast("double") - lo.cast("double")
      val scaled = when(span <= 0.0, lit(0L)).otherwise(
        floor((least(greatest(c.cast("double"), lo.cast("double")),
          hi.cast("double")) - lo.cast("double")) / span * top).cast("long"))
      least(scaled, lit(top)) // guard the c == hi edge rounding to top+1
    }
    val planes = for {
      i <- 0 until bits
      (c, j) <- norm.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    planes.reduce(_ bitwiseOR _)
  }

  /** Z-order layout rewrite: cluster `df` on the Morton interleave of
    * `zCols` (integral/temporal columns) and write `numFiles` parquet
    * files sorted by that curve. Files then cover small hyper-
    * rectangles of the key space instead of its full extent, so
    * parquet min/max row-group stats prune multi-dimensional range
    * predicates — the data-skipping complement to
    * [[compactPartitioned]] when queries filter on MORE dimensions
    * than the directory partitioning expresses (e.g. pickup time AND
    * location id). One stats row (broadcast) + one range shuffle +
    * a per-partition sort — no driver-side data.
    *
    * The write goes straight to `outDir` (callers doing an in-place
    * rewrite compose this with the retire/swap pattern above). */
  def zorderWrite(df: DataFrame, outDir: String, zCols: Seq[String],
                  numFiles: Int, bits: Int = 16): Unit = {
    val aggs = zCols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"__zmin_$c"),
      max(col(c)).cast("long").as(s"__zmax_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    df.join(broadcast(stats))
      .withColumn("__z", zorderValue(
        zCols.map(col), zCols.map(c => col(s"__zmin_$c")),
        zCols.map(c => col(s"__zmax_$c")), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z" +: zCols.flatMap(c =>
        Seq(s"__zmin_$c", s"__zmax_$c")): _*)
      .write.mode("overwrite").parquet(outDir)
  }
}
