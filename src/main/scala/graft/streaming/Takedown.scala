package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The compliance-takedown protocol shared by the stream-maintained
  * index families ([[StreamingDedupIngest]].retract and
  * [[StreamingAnnIngest]].retract): the families differ only in
  * their id/payload columns, their durable stores, and which index's
  * remove/rebuild they call — the ordering discipline, the sticky
  * intent ledger, and the crash-residue resolution live HERE once,
  * exactly as [[graft.ext.StoredIndex]] centralizes the commit-marker
  * mechanics the batch sides share.
  *
  * Ordering is load-bearing, and it is the REVERSE of ingest:
  * ledger first, then stores, index LAST. A crash at any point is
  * repaired by REPLAYING THE TAKEDOWN BATCH (takedown queues are
  * durable in practice, and [[retract]] is idempotent): the ledger
  * makes the replay exact, already-purged/tombstoned ids are
  * skipped, and the one unrecoverable residue — a live-indexed id
  * whose stored row is (correctly) already gone, so its fingerprint
  * XOR term cannot be recomputed — is detected and resolved by
  * rebuilding from the purged store. Index-first ordering would
  * instead open a window where recovery rebuilds RESURRECT the
  * retracted content — the one failure a takedown must never have.
  */
private[streaming] object Takedown {

  /** Ledgered ids, or None when no takedown was ever recorded. The
    * existence check is explicit and read errors PROPAGATE: a ledger
    * that exists but cannot be read must fail the batch, not
    * silently disable the retraction filter (failing open here is
    * exactly the resurrection the ledger prevents). */
  def ledgeredIds(spark: SparkSession, ledgerDir: String,
                  idCol: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(ledgerDir)
    if (!p.getFileSystem(
        spark.sparkContext.hadoopConfiguration).exists(p)) None
    else Some(spark.read.parquet(ledgerDir)
      .select(col(idCol)).distinct())
  }

  /** [[ledgeredIds]] in [[graft.ext.StoredIndex.Tombstones]] form:
    * driver literals when the ledger is small (the compliance-scale
    * common case), the distinct frame above the caps — so the
    * per-micro-batch sticky filter and the intent diff stop paying a
    * broadcast-build job each. Ids are unique by construction (only
    * not-yet-ledgered ids ever append), but the literal read
    * dedupes defensively to mirror the frame's `.distinct()`. */
  def ledgerSet(spark: SparkSession, ledgerDir: String,
                idCol: String): Option[graft.ext.StoredIndex.Tombstones] =
    graft.ext.StoredIndex.readIdAsset(spark, ledgerDir, idCol)
      .map(t => t.copy(
        litIds = t.litIds.map(_.distinct),
        frame = () => t.frame().distinct()))

  /** The per-micro-batch sticky filter: drop every ledgered id from
    * an incoming batch. Once an id is recorded, no replayed
    * micro-batch or future drop can re-admit it — including after a
    * compaction has materialized its tombstone (the physical-rows
    * anti-join alone stops filtering at that point; the ledger is
    * what makes the takedown durable against at-least-once
    * re-delivery). */
  def dropLedgered(spark: SparkSession, ledgerDir: String,
                   df: DataFrame, idCol: String): DataFrame =
    ledgerSet(spark, ledgerDir, idCol) match {
      case None => df
      case Some(t) => graft.ext.StoredIndex.antiIdFilter(t, df, idCol)
    }

  /** `(metric, value)` health row of the ledger's size — a
    * driver-known constant when the ledger reads as literals (no
    * aggregate subtree in the health plan), 0 when never written. */
  def ledgerCountRow(spark: SparkSession, ledgerDir: String,
                     idCol: String, name: String): DataFrame = {
    import graft.ext.StoredIndex.{litMetricRow, metricRow}
    ledgerSet(spark, ledgerDir, idCol) match {
      case Some(graft.ext.StoredIndex.Tombstones(Some(ids), _)) =>
        litMetricRow(spark, name, ids.size.toDouble)
      case Some(t) => metricRow(name, t.frame(), count(lit(1L)))
      case None => litMetricRow(spark, name, 0d)
    }
  }

  /** Resolve a PREDICATE takedown to its id set — how a compliance
    * request actually arrives ("everything from domain X", "all rows
    * matching Y"), not as an id list. The predicate evaluates ONCE,
    * at call time, over every durable store that exists (all of
    * them: a document whose only surviving copy is a quarantined
    * near-dup must still be found). None = no store exists yet, so
    * nothing can match — the predicate names no concrete ids to
    * ledger, which is why a predicate takedown on an empty ingest is
    * a no-op while an id takedown still records its ledger entry.
    * Rows arriving LATER that would match are not auto-retracted:
    * enforce recurring bans upstream of the stream, or re-run. */
  def idsMatching(spark: SparkSession, stores: Seq[String],
                  cond: Column, idCol: String,
                  cols: Seq[String]): Option[DataFrame] = {
    val existing = stores.filter { s =>
      val p = new org.apache.hadoop.fs.Path(s)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    if (existing.isEmpty) None
    else Some(existing.map(d =>
        spark.read.parquet(d).select(idCol, cols: _*))
      .reduce(_ unionByName _)
      .filter(cond).select(idCol).distinct())
  }

  /** The takedown id set as driver-side literals when the request is
    * small enough to become a pushdown-friendly predicate — None
    * above the cap (fall back to the semi-join). A compliance
    * takedown names few ids, so this is the overwhelmingly common
    * path, and it changes the affected-batch discovery from a
    * FULL-STORE scan (the semi-join reads every row of every batch
    * at 100 TB) to a footer-bound one: an IN/min-max predicate
    * reaches the parquet reader ([[purgeStore]] asserts it lands in
    * PushedFilters), so row groups whose id-column stats exclude the
    * request never decompress — and the per-batch id sort
    * (`writePartition` in both ingests) keeps those stats tight. */
  private[streaming] def idLiterals(ids: DataFrame, idCol: String,
                                    cap: Int): Option[Seq[Long]] = {
    val rows = ids.select(col(idCol).cast("long")).distinct()
      .limit(cap + 1).collect()
    if (rows.length > cap) None
    else Some(rows.map(_.getLong(0)).toIndexedSeq)
  }

  /** Rewrite ONLY the per-batch partition dirs that hold any of the
    * purged ids (partition-pruned: untouched batches never rewrite).
    * The affected-partition list is a bounded driver read — batch
    * ids, not rows — and for requests under `pushdownCap` ids the
    * discovery scan itself is footer-bound ([[idLiterals]]): the id
    * predicate pushes to parquet, so unaffected row groups are
    * skipped on stats instead of read.
    *
    * Cost note: the affected partitions rewrite SERIALLY on the
    * driver, one small Spark job each — bounded by the takedown
    * batch's distinct staged-batch partitions, which is the right
    * price at compliance scale (a takedown names few documents
    * across few batches). A takedown naming millions of rows across
    * thousands of batches would serialize thousands of small jobs;
    * batch such requests through a full store rewrite + index
    * rebuild instead. */
  def purgeStore(spark: SparkSession, root: String, ids: DataFrame,
                 idCol: String, cols: Seq[String],
                 pushdownCap: Int = 10000): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!rootPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration).exists(rootPath)) return
    val lits = idLiterals(ids, idCol, pushdownCap)
    if (lits.exists(_.isEmpty)) return // nothing to purge
    def hits(df: DataFrame): DataFrame = lits match {
      case Some(l) => df.filter(col(idCol).isin(l: _*))
      case None    => df.join(ids, Seq(idCol), "left_semi")
    }
    def drops(df: DataFrame): DataFrame = lits match {
      case Some(l) => df.filter(!col(idCol).isin(l: _*))
      case None    => df.join(ids, Seq(idCol), "left_anti")
    }
    val affected = hits(spark.read.parquet(root))
      .select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0))
    affected.foreach { b =>
      val pdir = s"$root/batch=$b"
      // materialize BEFORE overwriting the dir being read
      val remaining = drops(
          spark.read.option("basePath", root).parquet(pdir))
        .select(idCol, cols: _*).localCheckpoint()
      remaining.write.mode("overwrite").parquet(pdir)
    }
  }

  /** End-to-end takedown: record the ids in the durable intent
    * ledger (making the retraction STICKY against any replay), purge
    * them from every durable store, and un-mix them from the index —
    * tombstone the ids whose rows were still stored (`removeRows`),
    * or rebuild from the purged store (`rebuild`) when crash residue
    * makes the XOR un-mix impossible. See the object scaladoc for
    * why this ordering, and only this ordering, survives a crash at
    * every point.
    *
    * A takedown that arrives BEFORE any batch was ever ingested
    * (no primary store yet) completes as a ledger-only retraction:
    * the sticky ledger already guarantees the ids can never be
    * admitted, which IS the correct end state — not an error. */
  def retract(spark: SparkSession, ids: DataFrame, idCol: String,
              cols: Seq[String], ledgerDir: String,
              primaryStore: String, extraStores: Seq[String],
              liveIds: => DataFrame,
              removeRows: DataFrame => Unit,
              rebuild: () => Unit): Unit = {
    val want = ids.select(col(idCol).cast("long").as(idCol))
      .distinct().localCheckpoint()
    // durable intent FIRST: once recorded, no replayed micro-batch
    // or future drop can re-admit these ids. Only ids NOT already
    // ledgered append, so idempotent takedown replays leave the
    // ledger untouched — it grows with distinct retractions (the
    // compliance history), never with retries
    val newIntent = ledgerSet(spark, ledgerDir, idCol) match {
      case None => want
      case Some(t) => graft.ext.StoredIndex
        .antiIdFilter(t, want, idCol).localCheckpoint()
    }
    if (!newIntent.isEmpty)
      newIntent.write.mode("append").parquet(ledgerDir)
    // early takedown: nothing was ever ingested — the ledger entry
    // is the complete, correct retraction (see scaladoc)
    val primaryPath = new org.apache.hadoop.fs.Path(primaryStore)
    if (!primaryPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration).exists(primaryPath))
      return
    // fetch the rows BEFORE purging: the index un-mix needs them.
    // Same pushdown split as purgeStore: a compliance-scale request
    // becomes an IN predicate the parquet reader prunes row groups
    // with, instead of a full-store semi-join scan
    val rows = (idLiterals(want, idCol, 10000) match {
        case Some(l) if l.nonEmpty => spark.read.parquet(primaryStore)
          .filter(col(idCol).isin(l: _*))
        case Some(_) => spark.read.parquet(primaryStore)
          .filter(lit(false))
        case None => spark.read.parquet(primaryStore)
          .join(want, Seq(idCol), "left_semi")
      }).select(idCol, cols: _*)
      .localCheckpoint()
    (primaryStore +: extraStores).foreach(st =>
      purgeStore(spark, st, want, idCol, cols))
    val live = liveIds.localCheckpoint()
    val toTombstone = rows.join(live, Seq(idCol), "left_semi")
      .localCheckpoint()
    // live-indexed ids in the request with NO stored row = residue
    // of a crash between a previous purge and its index remove
    val unmixable = live.join(want, Seq(idCol), "left_semi")
      .join(toTombstone.select(idCol), Seq(idCol), "left_anti")
      .limit(1).count()
    if (unmixable > 0L) rebuild()
    else if (!toTombstone.isEmpty) removeRows(toTombstone)
  }
}
