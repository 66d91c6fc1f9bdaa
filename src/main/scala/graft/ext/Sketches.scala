package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Cardinality sketches with CROSS-ENGINE determinISM as a design
  * goal — the contrast to `approx_count_distinct` (HyperLogLog++,
  * whose register layout is engine-specific, so its registry row a11
  * can only be bounds-checked, never hash-compared).
  *
  * KMV ("k minimum values" / bottom-k, Bar-Yossef et al. 2002): hash
  * every value with xxhash64 (seed 42 — the engine's one hash
  * kernel), keep the k smallest DISTINCT hashes under unsigned
  * order, and estimate |D| = (k−1) / u_k where u_k is the k-th
  * minimum normalized into [0, 1). Every step is order-free
  * (min-of-set), bounded (the kept set is k hashes regardless of
  * scale), mergeable (union the bottom-k sets, re-take the bottom
  * k — how partial aggregation already combines under the hood),
  * and — because the hash is the replayable XXH64 —
  * SQL-expressible: the a24 registry row pins the ESTIMATE itself
  * hash-exact against DuckDB, not just error bounds.
  *
  * Plan: one scan → hash projection → hash-distinct (keys-only
  * shuffle) → `orderBy(h).limit(k)` (TakeOrderedAndProject: per-
  * partition bottom-k, then a k-sized driver-side merge — no global
  * sort) → one-row aggregate. Numeric discipline for the
  * cross-engine pin: unsigned hash order is realized by flipping the
  * sign bit (adding Long.MinValue wraps — a total order identical to
  * DuckDB's unsigned HUGEINT order); the double-domain k-th minimum
  * is recovered FROM the flipped value as `double(hf) + 2^63` — the
  * flipped long is exact in the integer domain for every regime
  * (including k ≤ |D| < 2k, where the unsigned k-th minimum exceeds
  * 2^63 and a naive signed cast would go negative); its int64→double
  * cast is one IEEE rounding, and the +2^63 add is a SECOND
  * correctly-rounded IEEE op (the add itself can round — near -2^63
  * the cast has already absorbed up to ~2^10, and the sum rounds
  * again). The cross-engine pin holds because BOTH engines execute
  * the identical two-op rounded sequence, not because either op is
  * exact — the oracle mirrors the same two-step expression
  * bit-for-bit instead of casting the unsigned value directly.
  * (k−1)·2^64 is exact in a double (8 significant bits). The
  * estimate is 4dp-rounded via the shared deterministic rounding.
  */
object Sketches {

  /** The MERGEABLE state of a KMV sketch over `key`: the bottom-k
    * DISTINCT sign-flipped hashes as a ≤ k-row `hf` frame.
    * bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) — set
    * union of identical-hash duplicates then re-take — so states fold
    * and merge EXACTLY (not approximately: the folded state is
    * bit-identical to the one-shot state over the union), which is
    * what lets [[kmvReport]] over a stored, incrementally-folded
    * gauge stay hash-exact against the one-shot oracle SQL. */
  def kmvState(df: DataFrame, key: Column, k: Int = 256): DataFrame = {
    require(k >= 2, s"kmvState needs k >= 2, got $k")
    // sign-bit flip: signed order of (h XOR sign bit) == unsigned
    // order of h (xor, not a wrapping add — ANSI mode forbids the
    // overflow the add relies on)
    df.select(xxhash64(key).bitwiseXOR(lit(Long.MinValue)).as("hf"))
      .distinct()
      .orderBy(col("hf"))
      .limit(k)
  }

  /** The one-row (n_kept, kth_hash, n_distinct_est) report of a
    * state frame — shared by the in-query [[kmvDistinct]] and the
    * stored-gauge [[kmvReport]], so both build the IDENTICAL
    * estimate expression (the a24 oracle's two-op IEEE sequence). */
  def kmvReportOf(state: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"kmvReportOf needs k >= 2, got $k")
    val twoPow64 = math.pow(2.0, 64) // exact: a power of two
    val twoPow63 = math.pow(2.0, 63) // exact: a power of two
    state
      .agg(count(lit(1L)).as("n_kept"), max(col("hf")).as("hf_k"))
      .select(col("n_kept"),
        col("hf_k").bitwiseXOR(lit(Long.MinValue)).as("kth_hash"),
        graft.ops.Ops.roundDet(
          when(col("n_kept") < k, col("n_kept").cast("double"))
            // u_k as a double, recovered from the flipped long:
            // exact-integer hf → one cast rounding → one more
            // identically-rounded IEEE add of 2^63. Valid for u_k
            // anywhere in [0, 2^64), i.e. for every distinct count
            // ≥ k — the oracle mirrors this exact two-op sequence
            // (see CoreQueries a24).
            .otherwise(lit((k - 1).toDouble * twoPow64) /
              (col("hf_k").cast("double") + lit(twoPow63))), 4)
          .as("n_distinct_est"))
  }

  /** One-row KMV cardinality report over `key`:
    * (n_kept, kth_hash, n_distinct_est) — n_kept < k means the
    * distinct count was under the sketch size and the "estimate" is
    * exact. */
  def kmvDistinct(df: DataFrame, key: Column, k: Int = 256): DataFrame =
    kmvReportOf(kmvState(df, key, k), k)

  // ----------------------------------------------- stored KMV gauge

  private def fsOf(spark: org.apache.spark.sql.SparkSession,
                   dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Persist a KMV state as a durable corpus gauge (≤ k rows of
    * `hf`) — the cardinality companion to [[KeywordIndex]]'s
    * additive (n_docs, sum_dl) `stats/` gauge for quantities that do
    * NOT fold additively (distinct counts): an ingest writes the
    * seed state once, [[kmvFold]]s each batch in O(k + batch keys),
    * and any datacard/health frame reads the estimate from the ≤ k
    * stored rows without ever re-scanning the corpus.
    *
    * Crash-safe swap (a streaming ingest folds this INSIDE its
    * per-batch commit window, so a torn write must not lose folded
    * state): the state lands whole in `<dir>__stage`, the live gauge
    * steps aside to `<dir>__old` (one rename), the stage renames in,
    * the residue drops. The single window this leaves — live absent,
    * `__old` present — is reversed EXACTLY by [[kmvHeal]], which
    * every read/fold runs first; no crash point loses a fold or
    * serves a half-written gauge. */
  def kmvWrite(state: DataFrame, dir: String): Unit = {
    val spark = state.sparkSession
    // gauge states are ≤ k rows (≤ bins for the histogram form) by
    // construction: compute them with ONE action (collect — this is
    // the same job the parquet write used to run) and land the file
    // driver-side, skipping the per-fold write job + commit protocol
    kmvWriteRows(spark, state.schema, state.collect().toSeq, dir)
  }

  /** [[kmvWrite]]'s swap on driver-held rows — the fold paths hold
    * the merged state on the driver already. */
  private[ext] def kmvWriteRows(spark: org.apache.spark.sql.SparkSession,
                                schema: org.apache.spark.sql.types.StructType,
                                rows: Seq[org.apache.spark.sql.Row],
                                dir: String): Unit = {
    val fs = fsOf(spark, dir)
    val live = new org.apache.hadoop.fs.Path(dir)
    val stage = new org.apache.hadoop.fs.Path(dir + "__stage")
    val old = new org.apache.hadoop.fs.Path(dir + "__old")
    fs.delete(stage, true)
    org.apache.spark.sql.graftshim.TinyParquetShim.overwriteDir(
      spark, schema, rows, stage.toString)
    fs.delete(old, true)
    if (fs.exists(live))
      require(fs.rename(live, old), s"kmvWrite: $live -> $old failed")
    require(fs.rename(stage, live), s"kmvWrite: $stage -> $live failed")
    fs.delete(old, true)
  }

  /** Reverse [[kmvWrite]]'s one crash window (live gauge absent,
    * `__old` present) by renaming the old generation back — an EXACT
    * restore, never a re-estimate. Returns whether a gauge exists at
    * `dir` after healing (false = virgin, seed it). */
  def kmvHeal(spark: org.apache.spark.sql.SparkSession,
              dir: String): Boolean = {
    val fs = fsOf(spark, dir)
    val live = new org.apache.hadoop.fs.Path(dir)
    val old = new org.apache.hadoop.fs.Path(dir + "__old")
    if (!fs.exists(live) && fs.exists(old))
      require(fs.rename(old, live), s"kmvHeal: $old -> $live failed")
    fs.exists(live)
  }

  /** Fold a batch into a stored KMV gauge: bottom-k of (stored ∪
    * batch state) — exact by the bottom-k union identity, O(k +
    * batch keys), the corpus never re-read. Materialized before the
    * swap of the asset it read; heals a mid-swap gauge first.
    * REPLAY-IDEMPOTENT by set semantics: the state is a set of
    * distinct hashes, so re-folding the SAME keys (an at-least-once
    * re-delivery) is a union with itself — bit-identical state, no
    * double count. */
  def kmvFold(spark: org.apache.spark.sql.SparkSession, dir: String,
              batch: DataFrame, key: Column, k: Int = 256): Unit = {
    require(kmvHeal(spark, dir),
      s"kmvFold: no stored gauge at $dir — seed it with kmvWrite first")
    // no localCheckpoint: kmvWrite collects the merged state (one
    // action) and lands it in the __stage dir, so the plan's read of
    // the live gauge completes before any rename touches it
    kmvWrite(kmvMergedState(
      Seq(spark.read.parquet(dir), kmvState(batch, key, k)), k), dir)
  }

  /** Merge independently-built KMV states (shard gauges) into one —
    * union, de-duplicate identical hashes, re-take the bottom k. */
  def kmvMergedState(states: Seq[DataFrame], k: Int): DataFrame = {
    require(states.nonEmpty, "kmvMergedState: no states")
    states.reduce(_ unionByName _).distinct().orderBy(col("hf")).limit(k)
  }

  /** The cardinality report of a stored gauge — ≤ k rows read, one
    * 1-row aggregate, hash-exact against the one-shot oracle over
    * whatever key population the folds covered. Heals a mid-swap
    * gauge first; a missing gauge fails loudly (never a silent 0). */
  def kmvReport(spark: org.apache.spark.sql.SparkSession, dir: String,
                k: Int = 256): DataFrame = {
    require(kmvHeal(spark, dir),
      s"kmvReport: no stored gauge at $dir")
    kmvReportOf(spark.read.parquet(dir), k)
  }

  // ------------------------ stored deterministic sample gauge

  /** The KMV construction carried one step further: keep the bottom-k
    * ROWS by key hash, not just the hashes — a DETERMINISTIC uniform
    * sample of the keyed population (hash order is data-independent,
    * so the k hash-smallest keys are a uniform without-replacement
    * draw; Bar-Yossef et al.'s bottom-k set, payload attached). The
    * maintained artifact every large-scale ingest datacard wants
    * beside its counts: "k representative live documents" at O(k)
    * storage, folded per batch, the corpus never re-read.
    *
    * The algebra is KMV's, so every maintenance path is EXACT, not
    * approximate:
    *  - fold/merge: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
    *    bottom-k(B)) — the folded state is bit-identical to the
    *    one-shot sample over the union, which is what lets a stored,
    *    incrementally-folded gauge pin hash-exact against one-shot
    *    oracle SQL;
    *  - replay: re-folding a re-delivered batch unions identical
    *    rows — full-row distinct absorbs it, bit-identical state;
    *  - removal ([[sampleRemove]] — the COMPLIANCE path: unlike the
    *    hash-only KMV state, this gauge stores content, so a
    *    takedown must purge it): dropping retracted keys from the
    *    stored prefix leaves EXACTLY the bottom-k′ of the live
    *    population (every live key outside the stored prefix hashes
    *    above it), k′ ≤ k — an under-full but exactly-uniform
    *    sample, never a biased one. Honest by construction: the
    *    discarded tail cannot be recovered without a reseed, the
    *    same one-way property the KMV estimate has.
    *
    * Contract: ONE ROW PER KEY (the population being sampled is the
    * keyed store, which dedup ingests keep key-unique); `checkKeys`
    * enforces it exactly per batch — an O(batch) keys shuffle,
    * disable it for callers whose store guarantees uniqueness
    * upstream. Ties: hash collisions of distinct keys order by
    * (hf, key), so the emitted state is deterministic under any
    * partitioning. Storage/crash posture is the KMV gauge's
    * verbatim ([[kmvWrite]]'s rename swap + [[kmvHeal]]).
    *
    * The state CARRIES ITS CAP: a `__k` column records the k the
    * prefix was truncated at, because the bottom-k union identity
    * only holds for folds/merges at a k NO LARGER than every
    * constituent's cap — a gauge seeded at k = 64 and folded at
    * k = 256 would silently emit a state that is NOT the bottom-256
    * of the union (the seed's discarded tail is unrecoverable).
    * [[sampleMergedState]] enforces it loudly; [[sampleReport]]
    * drops the column, so served samples are payload + `hf` only. */
  def sampleState(df: DataFrame, keyCol: String, k: Int = 256,
                  checkKeys: Boolean = true): DataFrame = {
    require(k >= 1, s"sampleState needs k >= 1, got $k")
    // full-row distinct FIRST: identical re-delivered rows collapse
    // (replay idempotence) without touching the one-row-per-key
    // contract
    val rows = df.distinct()
    if (checkKeys)
      require(rows.groupBy(col(keyCol)).count()
        .filter(col("count") > 1).limit(1).count() == 0L,
        s"sampleState: one row per $keyCol — two rows sharing a key " +
          "would make the sampled payload nondeterministic")
    rows.withColumn("hf",
        xxhash64(col(keyCol)).bitwiseXOR(lit(Long.MinValue)))
      .orderBy(col("hf"), col(keyCol))
      .limit(k)
      .withColumn("__k", lit(k))
  }

  /** Persist a sample state — [[kmvWrite]]'s crash-safe rename swap,
    * shared verbatim (the swap is schema-agnostic). */
  def sampleWrite(state: DataFrame, dir: String): Unit =
    kmvWrite(state, dir)

  /** Fold a batch into a stored sample gauge: bottom-k of (stored ∪
    * batch sample) — exact by the bottom-k union identity, O(k +
    * batch keys). Replay-idempotent by full-row set semantics. */
  def sampleFold(spark: org.apache.spark.sql.SparkSession,
                 dir: String, batch: DataFrame, keyCol: String,
                 k: Int = 256, checkKeys: Boolean = true): Unit = {
    require(kmvHeal(spark, dir),
      s"sampleFold: no stored gauge at $dir — seed it with " +
        "sampleWrite first")
    kmvWrite(sampleMergedState(
        Seq(spark.read.parquet(dir),
          sampleState(batch, keyCol, k, checkKeys)), keyCol, k), dir)
  }

  /** Merge independently-built sample states (shard gauges) into
    * one — union, full-row de-duplicate, re-take the bottom k.
    * Fails LOUDLY when `k` exceeds any constituent state's stored
    * cap (`__k`): a state truncated at a smaller k has discarded its
    * tail irrecoverably, so the merged frame would not be the
    * bottom-k of the union — the family's loud-failure posture,
    * never a silently-biased sample. (The cap read is one O(batch)
    * aggregate over the ≤ cap-sized states — control-plane priced,
    * same order as the merge itself.) A smaller k is always exact
    * (it shrinks every prefix consistently). */
  def sampleMergedState(states: Seq[DataFrame], keyCol: String,
                        k: Int): DataFrame = {
    require(states.nonEmpty, "sampleMergedState: no states")
    val all = states.reduce(_ unionByName _)
    val minK = all.agg(min(col("__k"))).head
    if (!minK.isNullAt(0))
      require(k <= minK.getInt(0),
        s"sampleMergedState: k = $k exceeds a constituent gauge's " +
          s"cap (${minK.getInt(0)}) — that state's discarded tail is " +
          "unrecoverable, so the merged state would NOT be the " +
          s"bottom-$k of the union; re-seed at the larger k instead")
    all.drop("__k").distinct()
      .orderBy(col("hf"), col(keyCol)).limit(k)
      .withColumn("__k", lit(k))
  }

  /** Purge retracted keys from a stored sample gauge — the
    * compliance half a payload-bearing gauge needs (a taken-down
    * document must leave the sample the moment it leaves the store).
    * O(k + retraction keys): the stored ≤ k rows anti-join the
    * retraction frame; the survivors are EXACTLY the bottom-k′ of
    * the live population (see the family scaladoc's prefix
    * argument). A key not in the sample purges vacuously — the call
    * is idempotent and needs no membership pre-check. */
  def sampleRemove(spark: org.apache.spark.sql.SparkSession,
                   dir: String, removed: DataFrame,
                   keyCol: String): Unit = {
    require(kmvHeal(spark, dir),
      s"sampleRemove: no stored gauge at $dir")
    kmvWrite(spark.read.parquet(dir)
      .join(broadcast(removed.select(col(keyCol)).distinct()),
        Seq(keyCol), "left_anti"), dir)
  }

  /** The sampled rows of a stored gauge, (hf, key)-ordered — ≤ k
    * rows read, the population never re-scanned. Heals a mid-swap
    * gauge first; a missing gauge fails loudly. */
  def sampleReport(spark: org.apache.spark.sql.SparkSession,
                   dir: String, keyCol: String): DataFrame = {
    require(kmvHeal(spark, dir),
      s"sampleReport: no stored gauge at $dir")
    spark.read.parquet(dir).drop("__k")
      .orderBy(col("hf"), col(keyCol))
  }

  // ------------------------------ stored exact histogram gauge

  /** The EXACT member of the stored-gauge family: a binned value
    * histogram as additive (bin, n) rows — [[KeywordIndex]]'s
    * (n_docs, sum_dl) gauge generalized from two scalars to a
    * distribution. Everything the sketch gauges approximate or
    * cannot do, this one does exactly, because counts are a group:
    *  - fold/merge: add counts by bin (commutative/associative — the
    *    folded gauge is bit-identical to the one-shot histogram);
    *  - removal ([[histRemove]] — the capability the KMV gauge's
    *    monotonicity note documents as impossible for a sketch):
    *    SUBTRACT the retracted rows' counts by bin, exactly; a
    *    subtraction that would drive any bin negative means the
    *    caller is removing rows that were never folded, and fails
    *    loudly instead of silently corrupting the distribution;
    *  - quantiles ([[histQuantile]]): EXACT at bin resolution — the
    *    q-quantile's bin is the first whose cumulative count reaches
    *    ceil(q·N) (the discrete lower-quantile convention), read
    *    from the O(bins) stored rows with the population never
    *    re-scanned.
    * State size is value-range/binWidth — config-bounded by the
    * caller (document lengths, scores, latencies: all naturally
    * bounded), never population-sized. Replay is the ONE property
    * the additive algebra does NOT give for free (adding twice
    * double-counts — unlike the set-semantics gauges), so an
    * at-least-once ingest must gate re-delivered rows BEFORE the
    * fold (re-delivered BATCHES are gated by the watermarked form,
    * [[histFoldMarked]]), exactly as [[graft.streaming.StreamingDedupIngest]]'s
    * bloom gate already does for its index append. Storage/crash
    * posture is the family's rename swap verbatim. */
  def histState(df: DataFrame, value: Column,
                binWidth: Long = 1L): DataFrame = {
    require(binWidth >= 1L, s"histState needs binWidth >= 1, got $binWidth")
    df.select((floor(value.cast("double") / lit(binWidth.toDouble))
        .cast("long") * lit(binWidth)).as("bin"))
      .groupBy("bin").agg(count(lit(1L)).as("n"))
  }

  /** Persist a histogram state — the family's crash-safe swap. */
  def histWrite(state: DataFrame, dir: String): Unit =
    kmvWrite(state, dir)

  /** Fold a batch into a stored histogram gauge: add counts by bin —
    * O(bins + batch), the population never re-read. NOT
    * replay-idempotent (see the family scaladoc): gate re-delivered
    * rows before folding. */
  def histFold(spark: org.apache.spark.sql.SparkSession, dir: String,
               batch: DataFrame, value: Column,
               binWidth: Long = 1L): Unit = {
    require(kmvHeal(spark, dir),
      s"histFold: no stored gauge at $dir — seed it with histWrite first")
    histWrite(histMergedState(Seq(spark.read.parquet(dir),
      histState(batch, value, binWidth))), dir)
  }

  /** Merge histogram states (shard gauges): add counts by bin. */
  def histMergedState(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "histMergedState: no states")
    states.reduce(_ unionByName _)
      .groupBy("bin").agg(sum(col("n")).as("n"))
  }

  /** Subtract retracted rows' counts from a stored histogram gauge —
    * EXACT, the additive inverse a sketch cannot have. The removed
    * frame must contain rows that WERE folded (same values, same
    * binWidth): a bin driven negative fails loudly. Bins emptied to
    * zero are dropped (the gauge stays dense over live mass only). */
  def histRemove(spark: org.apache.spark.sql.SparkSession,
                 dir: String, removed: DataFrame, value: Column,
                 binWidth: Long = 1L): Unit = {
    require(kmvHeal(spark, dir),
      s"histRemove: no stored gauge at $dir")
    val gone = histState(removed, value, binWidth)
      .select(col("bin"), (-col("n")).as("n"))
    val folded = histMergedState(Seq(spark.read.parquet(dir), gone))
    // one action (collect of the O(bins) fold) carries the negative-
    // bin guard AND the filtered write — the former localCheckpoint +
    // guard count + write ran three
    val rows = folded.collect().toSeq
    val nAt = folded.schema.fieldIndex("n")
    require(!rows.exists(r => !r.isNullAt(nAt) && r.getLong(nAt) < 0),
      "histRemove: subtraction drives bin(s) negative — the removed " +
        "rows were never folded into this gauge (value/binWidth " +
        "mismatch or a double removal)")
    kmvWriteRows(spark, folded.schema,
      rows.filter(r => !r.isNullAt(nAt) && r.getLong(nAt) > 0), dir)
  }

  /** The stored histogram, bin-ordered — O(bins) rows read. The
    * watermark column of a marked gauge (see [[histFoldMarked]]) is
    * state-internal and dropped; plain gauges are unaffected. */
  def histReport(spark: org.apache.spark.sql.SparkSession,
                 dir: String): DataFrame = {
    require(kmvHeal(spark, dir),
      s"histReport: no stored gauge at $dir")
    spark.read.parquet(dir).drop("__mark").orderBy("bin")
  }

  // ------------------ watermarked histogram gauge (streaming form)

  /** The additive histogram's at-least-once ingest posture: the one
    * property the (bin, n) group algebra does NOT give for free is
    * replay idempotence — re-folding a re-delivered batch
    * double-counts, where the set-semantics gauges (KMV, sample)
    * absorb it. A streaming ingest therefore folds through THIS
    * form, which carries a batch-id WATERMARK inside the gauge
    * itself (a constant `__mark` column on the O(bins) rows — the
    * one-atomic-swap trick: fold and watermark commit together
    * through [[kmvWrite]]'s rename, so no crash point can admit a
    * fold without its mark or vice versa). [[histFoldMarked]] skips
    * any batch at-or-below the stored mark — exactly the replayed
    * prefix a restarted micro-batch stream re-delivers — making the
    * fold idempotent under at-least-once delivery with NO
    * population-sized state ([[graft.streaming.StreamingDedupIngest]]
    * wires it per accepted batch; the bloom/ledger gate ahead of it
    * keeps re-delivered ROWS out, this keeps re-delivered BATCHES
    * out across the store-written-but-index-uncommitted crash
    * window). */
  def histWriteMarked(state: DataFrame, dir: String,
                      mark: Long): Unit =
    histWrite(state.withColumn("__mark", lit(mark)), dir)

  /** `schema` with the `__mark` column appended — the exact shape
    * `withColumn("__mark", lit(mark))` produces (non-nullable long),
    * for the driver-side write paths. */
  private def markedSchema(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("__mark",
        org.apache.spark.sql.types.LongType, nullable = false))

  /** Driver-side read of a marked gauge's watermark — the gauge is
    * O(bins) rows by construction, so the former max-aggregate
    * action per fold/read was pure overhead. */
  private def storedMark(spark: org.apache.spark.sql.SparkSession,
                         dir: String): Long = {
    val rows = org.apache.spark.sql.graftshim.TinyParquetShim
      .readRows(spark, dir).getOrElse(Seq.empty)
    require(rows.nonEmpty, s"storedMark: empty gauge at $dir")
    val at = rows.head.fieldIndex("__mark")
    rows.map(_.getLong(at)).max
  }

  /** The stored watermark of a marked gauge — the highest batch id
    * whose fold has committed. */
  def histMark(spark: org.apache.spark.sql.SparkSession,
               dir: String): Long = {
    require(kmvHeal(spark, dir), s"histMark: no stored gauge at $dir")
    storedMark(spark, dir)
  }

  /** Fold a batch into a marked gauge UNLESS its mark is at or below
    * the stored watermark (a replay — skipped, bit-identical state).
    * Returns whether the fold ran. O(bins + batch) when it does. */
  def histFoldMarked(spark: org.apache.spark.sql.SparkSession,
                     dir: String, batch: DataFrame, value: Column,
                     mark: Long, binWidth: Long = 1L): Boolean = {
    require(kmvHeal(spark, dir),
      s"histFoldMarked: no stored gauge at $dir — seed it with " +
        "histWriteMarked first")
    val at = storedMark(spark, dir)
    if (mark <= at) return false
    histWriteMarked(histMergedState(
        Seq(spark.read.parquet(dir).drop("__mark"),
          histState(batch, value, binWidth))),
      dir, mark)
    true
  }

  /** Fold rows into a marked gauge WITHOUT advancing the watermark —
    * the CORRECTION path (a readmit returns quarantined rows into
    * batches already at-or-below the mark, so the batch gate cannot
    * key it). NOT replay-gated here: the caller must key the rows on
    * its own not-yet-applied set (e.g. the bloom-gated not-yet-
    * indexed split) and document its crash window. */
  def histAddMarked(spark: org.apache.spark.sql.SparkSession,
                    dir: String, rows: DataFrame, value: Column,
                    binWidth: Long = 1L): Unit = {
    require(kmvHeal(spark, dir),
      s"histAddMarked: no stored gauge at $dir")
    val at = storedMark(spark, dir)
    histWriteMarked(histMergedState(
        Seq(spark.read.parquet(dir).drop("__mark"),
          histState(rows, value, binWidth))),
      dir, at)
  }

  /** [[histRemove]] on a marked gauge — the EXACT subtraction with
    * the negative-bin loud guard, watermark preserved (a takedown is
    * not a batch; the replay gate is untouched). Idempotence comes
    * from the CALLER's store: a re-run subtracts the rows it can
    * still read, and a purged store yields an empty frame — a
    * vacuous, safe no-op (the [[graft.streaming.Takedown]] retract
    * ordering). */
  def histRemoveMarked(spark: org.apache.spark.sql.SparkSession,
                       dir: String, removed: DataFrame, value: Column,
                       binWidth: Long = 1L): Unit = {
    require(kmvHeal(spark, dir),
      s"histRemoveMarked: no stored gauge at $dir")
    val at = storedMark(spark, dir)
    val gone = histState(removed, value, binWidth)
      .select(col("bin"), (-col("n")).as("n"))
    val folded = histMergedState(
      Seq(spark.read.parquet(dir).drop("__mark"), gone))
    val rows = folded.collect().toSeq
    val nAt = folded.schema.fieldIndex("n")
    require(!rows.exists(r => !r.isNullAt(nAt) && r.getLong(nAt) < 0),
      "histRemoveMarked: subtraction drives bin(s) negative — the " +
        "removed rows were never folded into this gauge (value/" +
        "binWidth mismatch or a double removal)")
    kmvWriteRows(spark,
      markedSchema(folded.schema),
      rows.filter(r => !r.isNullAt(nAt) && r.getLong(nAt) > 0)
        .map(r => Row.fromSeq(r.toSeq :+ at)), dir)
  }

  /** EXACT discrete quantiles from the stored gauge — for each q,
    * the first bin whose running count reaches ceil(q·N) (lower
    * quantile; q = 0 reads the min bin, q = 1 the max). One O(bins)
    * cumulative window over the gauge rows — the population is
    * never re-scanned, so a datacard reads p50/p95/p99 from the
    * same ≤ bins rows at any corpus scale. */
  def histQuantile(spark: org.apache.spark.sql.SparkSession,
                   dir: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "histQuantile: no quantiles requested")
    qs.foreach(q => require(q >= 0.0 && q <= 1.0,
      s"histQuantile: q must be in [0, 1], got $q"))
    require(kmvHeal(spark, dir),
      s"histQuantile: no stored gauge at $dir")
    import org.apache.spark.sql.expressions.Window
    val h = spark.read.parquet(dir).drop("__mark")
    // bins are config-bounded (the family scaladoc), so the single-
    // partition cumulative window is bounded work by construction
    val cum = h.withColumn("cum",
      sum(col("n")).over(Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(h.agg(sum(col("n")).as("total"))))
    qs.map { q =>
      cum.filter(col("cum") >=
          greatest(ceil(lit(q) * col("total")), lit(1L)))
        .agg(min(col("bin")).as("value"))
        .select(lit(q).as("q"), col("value"))
    }.reduce(_ unionByName _).orderBy("q")
  }
}
