package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension (SCD2) maintenance: rebuild a
  * versioned history from an append-only change log, and apply an
  * incremental update batch to a current snapshot (the lakehouse
  * MERGE pattern, expressed as joins + unions so it runs on plain
  * parquet without a table format).
  *
  * The reference pipeline rebuilds its dimensions by full overwrite
  * every run (src/etl/silver.py dims path — correct because its dims
  * are config-small). At 100 TB the dimension WITH history is itself
  * big (every user/document carries versioned attributes), so both
  * operations here stay fully distributed:
  *
  *  - [[fromLog]] is one shuffle on the business key + two window
  *    passes over the SAME (key, order) sort — Spark plans a single
  *    Exchange and reuses the sort for both windows.
  *  - [[applyChanges]] joins the snapshot against the update batch on
  *    the business key. The batch is the small side by contract (one
  *    increment vs the whole history) and is broadcast, so the
  *    snapshot never shuffles at all.
  */
object Scd2 {

  /** Rebuild the full SCD2 history of one attribute from a change
    * log. Consecutive rows (per key, ordered by `tsCol` then
    * `tieCol`) that repeat the same attribute value are compressed
    * away; each surviving row becomes a version with
    * `valid_from = its timestamp` and `valid_to = next version's
    * timestamp` (NULL for the current version).
    *
    * `tieCol` must make the per-key order total (a unique event id):
    * with equal timestamps and no tie-break, which duplicate row wins
    * would be nondeterministic, and so would the whole history.
    * `attr` must be non-null: the repeat filter compares with `=!=`,
    * so a NULL attribute row after a non-null one is dropped as a
    * repeat (NULL-valued "changes" are not versions — encode absence
    * as a sentinel value if the domain needs it).
    *
    * Output: key, attr, valid_from, valid_to — the standard "as of t,
    * the value was v" lookup shape ([[Ops.asofJoin]] consumes it
    * directly).
    */
  def fromLog(log: DataFrame, key: String, tsCol: String,
              attr: String, tieCol: String): DataFrame = {
    val order = Seq(col(tsCol), col(tieCol))
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    // pass 1: drop rows whose attribute repeats the previous row's
    val changes = log
      .select(col(key), col(tsCol), col(attr), col(tieCol))
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
      .drop("__prev")
    // pass 2 (same partitioning + order, Exchange reused): each
    // surviving change is valid until the next one
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .drop(tsCol, tieCol)
  }

  /** Apply an incremental update batch to a current SCD2 snapshot —
    * the lakehouse MERGE, in ONE pass over one broadcast join.
    *
    * `current` holds the open versions as (key, attr, valid_from) —
    * valid_to IS NULL is implied, callers pass only current rows.
    * `updates` holds at most one new attribute value per key, all
    * effective at `effTs`. Per key:
    *
    *  - update with a DIFFERENT value: the open row is closed out
    *    (`valid_to = effTs`) and a new open row is appended;
    *  - no update, or an update equal to the current value (no-op
    *    churn rows — real CDC feeds are full of them): the open row
    *    passes through untouched;
    *  - update whose key has NO open row (a new entity in the CDC
    *    feed — the "not matched by target" arm of MERGE): a new open
    *    row is inserted with `valid_from = effTs`.
    *
    * Each joined row emits its 1 (pass-through) or 2 (close-out +
    * reopen) output rows through a single generate — NOT three
    * filtered branches unioned, which would scan and join the whole
    * snapshot three times. The update batch is broadcast
    * (config-small by contract: one increment vs the whole
    * dimension), so the big snapshot is never shuffled. The insert
    * arm costs one extra KEYS-ONLY pass over the snapshot: a
    * broadcast semi join finds which update keys already exist
    * (result ≤ the batch, so it broadcasts in turn), and the batch
    * anti-joins that small set — broadcast joins throughout, zero
    * hash-partition exchanges (PlanSpec locks this). With a genuinely
    * big batch callers pre-partition both sides on `key` and drop the
    * broadcasts instead.
    */
  def applyChanges(current: DataFrame, updates: DataFrame, key: String,
                   attr: String, effTs: Column): DataFrame = {
    val upd = broadcast(
      updates.select(col(key).as("__uk"), col(attr).as("__uv")))
    val changed = coalesce(
      col("__uk").isNotNull && col("__uv") =!= col(attr), lit(false))
    val openTo = lit(null).cast("timestamp")
    def version(a: Column, from: Column, to: Column) =
      struct(a.as("__a"), from.as("__f"), to.as("__t"))
    val merged = current.join(upd, col(key) === col("__uk"), "left")
      .select(col(key), explode(when(changed,
          array(version(col(attr), col("valid_from"), effTs),
            version(col("__uv"), effTs, openTo)))
        .otherwise(
          array(version(col(attr), col("valid_from"), openTo))))
        .as("__v"))
      .select(col(key), col("__v.__a").as(attr),
        col("__v.__f").as("valid_from"), col("__v.__t").as("valid_to"))
    // insert arm: update keys with no open row become new open
    // versions. current has one open row per key by contract, so the
    // semi join output is ≤ |updates| rows — small enough to
    // broadcast into the anti join; the snapshot side is a
    // column-pruned keys-only scan, never shuffled.
    val matchedKeys = current.select(col(key).as("__mk"))
      .join(upd.select(col("__uk")), col("__mk") === col("__uk"),
        "left_semi")
    val inserts = upd
      .join(broadcast(matchedKeys), col("__uk") === col("__mk"),
        "left_anti")
      .select(col("__uk").as(key), col("__uv").as(attr),
        effTs.cast("timestamp").as("valid_from"),
        openTo.as("valid_to"))
    merged.unionByName(inserts)
  }

  /** Snapshot diff — the change-data feed between two versions of a
    * dimension: which keys were ADDED, REMOVED, or CHANGED (any
    * compared column differs) from `before` to `after`. The CDC
    * producer side of [[applyChanges]]: diff two snapshots when no
    * change log exists, then feed the result to the merge.
    *
    * One full-outer join on the key; each side first reduces to
    * (key, md5-of-compared-columns), so wide dimension payloads never
    * enter the shuffle — the same fingerprint trick as the dedup
    * family. Unchanged keys are dropped in the join output filter.
    * Output: (key, change ∈ {added, removed, changed}). */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compared column")
    def fp(df: DataFrame, k: String, h: String): DataFrame =
      df.select(col(key).as(k),
        md5(concat_ws("\u0001", compareCols.map(c =>
          coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as(h))
    fp(before, "__bk", "__bh")
      .join(fp(after, "__ak", "__ah"),
        col("__bk") === col("__ak"), "full_outer")
      .withColumn("change",
        when(col("__bk").isNull, "added")
          .when(col("__ak").isNull, "removed")
          .when(col("__bh") =!= col("__ah"), "changed"))
      .filter(col("change").isNotNull)
      .select(coalesce(col("__bk"), col("__ak")).as(key), col("change"))
  }

  /** Point-in-time (AS OF) lookup over an SCD2 version table: the one
    * version of each key valid at `at` — the read side every SCD2
    * write path ([[fromLog]]/[[applyChanges]]) exists to serve
    * ("which vendor name did the model see when this training row was
    * built"). A pure scan-side filter on the half-open interval
    * `[valid_from, valid_to)` with NULL valid_to = open: no shuffle,
    * no window — version tables are read far more often than rebuilt,
    * so the lookup must ride the scan (and any partition/row-group
    * pruning on valid_from) untouched. Keys born after `at` simply
    * have no row. */
  def asOf(versions: DataFrame, at: Column): DataFrame =
    versions.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
