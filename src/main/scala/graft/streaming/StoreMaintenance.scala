package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance surface of the per-batch durable stores both
  * stream-maintained index families write
  * ([[StreamingDedupIngest]]'s corpus/quarantine,
  * [[StreamingAnnIngest]]'s vector store): the stores land one
  * `batch=<id>/` partition directory per micro-batch — which is what
  * makes replayed batches idempotent (a replay REWRITES its own
  * partition) and takedowns partition-pruned
  * ([[Takedown.purgeStore]]) — and that layout buys two more
  * capabilities plus one liability, all handled here:
  *
  *  - **As-of reads** ([[asOf]]): the accepted store as of a
  *    micro-batch id — the reproducibility contract a training run
  *    needs ("train on exactly what the ingest had accepted at batch
  *    N", re-readable bit-identically after later batches land).
  *    Partition-pruned: later batch dirs are never opened. Takedowns
  *    are deliberately NOT versioned — a purge rewrites history in
  *    place, so an as-of read after a takedown serves the PURGED
  *    view of those batches; anything else would defeat compliance.
  *  - **The batch ledger** ([[batches]]): which batch ids landed and
  *    their accepted row counts — the observable spine the as-of
  *    contract pins against.
  *  - **Small-file compaction** ([[compactStore]]): a long-running
  *    ingest accretes one partition dir per micro-batch, each
  *    holding up to shuffle-partitions part files of a micro-batch's
  *    worth of rows — the classic streaming small-file liability (at
  *    100 TB: millions of KB-sized files dominate open/list cost).
  *    Compaction rewrites each over-threshold batch dir to ONE file,
  *    PRESERVING the batch=… layout — as-of granularity, replay
  *    idempotency, and purge pruning all survive — via a
  *    stage-then-swap protocol whose every crash window
  *    [[heal]] resolves (the store is the family's durable source of
  *    truth; "crash mid-compact loses a batch" is not an acceptable
  *    failure mode).
  */
private[streaming] object StoreMaintenance {

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, root: String): Boolean =
    fsOf(spark, root).exists(new Path(root))

  /** The batch ledger: (batch, n_rows) per landed micro-batch,
    * batch-ordered. Partition-column listing + per-dir counts — row
    * GROUPS are counted from parquet footers, bodies never read. */
  def batches(spark: SparkSession, root: String): DataFrame = {
    heal(spark, root)
    spark.read.parquet(root)
      .groupBy(col("batch").cast("long").as("batch"))
      .agg(count(lit(1L)).as("n_rows"))
      .orderBy("batch")
  }

  /** The highest landed batch id (−1 when the store is absent or
    * empty) — derived from the `batch=N` partition-dir listing,
    * driver-side: the ledger's `max(batch)` without a Spark job
    * (every landed batch has its dir; empty batches are never
    * written, so listing-max ≡ ledger-max). Heals first, like every
    * reader entry point here. */
  def maxLandedBatch(spark: SparkSession, root: String): Long = {
    heal(spark, root)
    val fs = fsOf(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return -1L
    val ids = fs.listStatus(rootPath).toSeq.collect {
      case st if st.isDirectory &&
          st.getPath.getName.startsWith("batch=") =>
        st.getPath.getName.stripPrefix("batch=").toLong
    }
    if (ids.isEmpty) -1L else ids.max
  }

  /** The store as of micro-batch `maxBatch` (inclusive): every
    * accepted row from batch dirs <= maxBatch, with the partition
    * column dropped — bit-identical no matter how many batches land
    * afterwards (modulo takedowns, which purge history in place by
    * design — see the object scaladoc). The filter sits on the
    * partition column, so later batches prune at the listing. */
  def asOf(spark: SparkSession, root: String, maxBatch: Long): DataFrame = {
    heal(spark, root)
    spark.read.parquet(root)
      .filter(col("batch").cast("long") <= maxBatch)
      .drop("batch")
  }

  /** The rows that landed in batches (fromBatch, toBatch] — the
    * incremental-training read ("everything accepted since the run
    * that stopped at batch N"), partition-pruned on both bounds.
    * [[asOf]](to) ≡ [[asOf]](from) ∪ delta(from, to) by
    * construction; takedowns pierce it like any store read. */
  def delta(spark: SparkSession, root: String, fromBatch: Long,
            toBatch: Long): DataFrame = {
    heal(spark, root)
    spark.read.parquet(root)
      .filter(col("batch").cast("long") > fromBatch &&
        col("batch").cast("long") <= toBatch)
      .drop("batch")
  }

  private def stagedName(batchDir: String) = s".$batchDir.compact"

  /** Resolve any crash residue of a [[compactStore]] swap. The swap
    * per batch dir is: (1) write staged `.batch=N.compact`, (2)
    * delete `batch=N`, (3) rename staged into place. A crash leaves
    * at most one of two states, each unambiguous:
    *  - staged AND live present (crash in/after 1): the staged copy
    *    is redundant — drop it;
    *  - staged present, live missing (crash between 2 and 3): the
    *    staged dir holds the batch's full content — rename it in.
    * Idempotent and O(one root listing); called by every reader
    * entry point here so a crashed compaction can never make a batch
    * invisible to the store's consumers. */
  def heal(spark: SparkSession, root: String): Unit = {
    val fs = fsOf(spark, root)
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return
    fs.listStatus(rootPath).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith(".batch=") &&
          n.endsWith(".compact")) {
        val live = new Path(rootPath,
          n.stripPrefix(".").stripSuffix(".compact"))
        if (fs.exists(live)) fs.delete(st.getPath, true)
        else require(fs.rename(st.getPath, live),
          s"heal: rename ${st.getPath} -> $live failed")
      }
    }
  }

  /** Rewrite every batch dir holding more than `maxFilesPerBatch`
    * parquet part files down to one file each, keeping the batch=…
    * layout. Returns the number of batch dirs rewritten. Each dir
    * swaps independently (stage → delete → rename, [[heal]]-covered
    * at every crash point), so a crash mid-store leaves some dirs
    * compacted and the rest untouched — content-identical either
    * way. One coalesced file per MICRO-BATCH is the right target:
    * micro-batches are bounded by the trigger, not corpus-sized. */
  def compactStore(spark: SparkSession, root: String,
                   maxFilesPerBatch: Int = 4): Int = {
    require(maxFilesPerBatch >= 1,
      s"maxFilesPerBatch must be >= 1, got $maxFilesPerBatch")
    heal(spark, root)
    if (!exists(spark, root)) return 0
    val fs = fsOf(spark, root)
    val rootPath = new Path(root)
    val over = fs.listStatus(rootPath).filter { st =>
      st.isDirectory && st.getPath.getName.startsWith("batch=") &&
        fs.listStatus(st.getPath).count { f =>
          f.isFile && f.getPath.getName.endsWith(".parquet")
        } > maxFilesPerBatch
    }
    over.foreach { st =>
      val name = st.getPath.getName
      val staged = new Path(rootPath, stagedName(name))
      // hidden (dot-prefixed) staging dir: parquet listing ignores
      // it, so readers racing the compaction never see both copies
      val rows = spark.read.option("basePath", root)
        .parquet(st.getPath.toString)
        .drop("batch")
      // re-sort by the store's id column (first column, by both
      // families' writePartition convention) so the compacted file's
      // row-group stats stay as takedown-prunable as the originals
      rows.coalesce(1).sortWithinPartitions(rows.columns.head)
        .write.mode("overwrite").parquet(staged.toString)
      fs.delete(st.getPath, true)
      require(fs.rename(staged, st.getPath),
        s"compactStore: rename $staged -> ${st.getPath} failed")
    }
    over.length
  }
}
