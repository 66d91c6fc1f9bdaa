package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: z-order clustering keys, zone maps
  * (per-file min/max statistics), and the file-pruning arithmetic
  * that turns the two into skipped I/O (extension beyond the
  * reference — its warehouse is a single-node Postgres where layout
  * is the planner's problem; on a 100 TB lake the TABLE LAYOUT is
  * the first query optimizer).
  *
  * The mechanism, end to end:
  *  - [[zorderKey2]] interleaves the bits of two bucketized
  *    dimensions so that rows close in BOTH dimensions get close
  *    keys (Morton order). Sorting/range-partitioning by that key
  *    and chunking into files gives every file a tight 2-D bounding
  *    box instead of a full-width stripe.
  *  - A zone map ([[zonemap2]]) is the per-file (min, max) of each
  *    dimension — the footer statistics every modern columnar format
  *    (parquet row groups, Iceberg/Delta file stats) already keeps.
  *  - A 2-D range predicate then scans ONLY files whose box
  *    intersects the predicate box ([[pruneStats2]]). Under a linear
  *    (x-major) layout the y-dimension bounds are full-width in
  *    every file, so y-predicates prune nothing; under z-order both
  *    dimensions prune — the measured gap is the point of the z3 row.
  *
  * Everything here is plain codegen'd integer arithmetic (shifts and
  * masks — the standard two-dimension Morton spread), deterministic,
  * and therefore DuckDB-oracle-able bit for bit. Files are modeled
  * as equal-WIDTH key ranges (key >> shift), the idealization of a
  * range-partitioned write; production uses repartitionByRange
  * (sampled splits) to get equal-SIZE files, which only tightens the
  * boxes further. No global window, no shuffle beyond the per-file
  * aggregation itself.
  */
object Layout {

  /** Spread the low 16 bits of x to even bit positions 0,2,4,…,30
    * (the classic mask-doubling sequence). Input must already be
    * bucketized to [0, 2^16); the caller picks the bucketing. */
  private def spread16(x: Column): Column = {
    val v0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton (z-order) key of two dimensions bucketized to
    * [0, 2^16): bit i of `a` lands at position 2i+1, bit i of `b`
    * at 2i — a 2-D space-filling curve in one codegen'd projection
    * (10 shifts + 10 masks, no custom expression, no shuffle). */
  def zorderKey2(a: Column, b: Column): Column =
    shiftleft(spread16(a), 1).bitwiseOR(spread16(b))

  /** X-major linear key over the same bucket space — the layout a
    * plain `ORDER BY x` write produces, kept on the identical
    * key-width so file chunking (key >> shift) is comparable. */
  def linearKey2(a: Column, b: Column, bBits: Int): Column =
    shiftleft(a.cast("long"), bBits).bitwiseOR(b.cast("long"))

  /** Zone map of a keyed layout: chunk rows into files by the top
    * key bits (file = key >> shift) and record each file's per-
    * dimension (min, max) plus row count — one key-ranged
    * aggregation, the file-footer statistics a lake write produces
    * for free. */
  def zonemap2(df: DataFrame, key: Column, shift: Int,
               xb: Column, yb: Column): DataFrame =
    df.select(shiftrightunsigned(key, shift).as("file_id"),
        xb.as("xb"), yb.as("yb"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("xb")).as("min_x"), max(col("xb")).as("max_x"),
        min(col("yb")).as("min_y"), max(col("yb")).as("max_y"))

  /** Files a 2-D range predicate must scan given a zone map: the
    * box-intersection test every stats-based file pruner runs. */
  def scannedFiles(zm: DataFrame, x1: Int, x2: Int,
                   y1: Int, y2: Int): DataFrame =
    zm.filter(col("min_x") <= x2 && col("max_x") >= x1 &&
      col("min_y") <= y2 && col("max_y") >= y1)

  /** One-row pruning report for a predicate box under BOTH layouts:
    * files/rows scanned linear vs z-order, plus the true selected
    * row count (the lower bound any layout must read). The z-order
    * win is (rows_linear − rows_zorder) of avoided I/O per query —
    * at 100 TB the difference between a stripe scan and a quadrant
    * read. */
  def pruneStats2(df: DataFrame, xb: Column, yb: Column, bits: Int,
                  filesShift: Int, x1: Int, x2: Int, y1: Int,
                  y2: Int): DataFrame = {
    val base = df.select(xb.as("xb"), yb.as("yb"))
    val zm = zonemap2(base, zorderKey2(col("xb"), col("yb")),
      filesShift, col("xb"), col("yb"))
    val lm = zonemap2(base, linearKey2(col("xb"), col("yb"), bits),
      filesShift, col("xb"), col("yb"))
    val zs = scannedFiles(zm, x1, x2, y1, y2)
      .agg(count(lit(1)).as("files_zorder"),
        sum(col("n_rows")).as("rows_zorder"))
    val ls = scannedFiles(lm, x1, x2, y1, y2)
      .agg(count(lit(1)).as("files_linear"),
        sum(col("n_rows")).as("rows_linear"))
    val hits = base.filter(col("xb").between(x1, x2) &&
        col("yb").between(y1, y2))
      .agg(count(lit(1)).as("rows_selected"))
    // three one-row aggregates side by side (the audited e8 shape)
    ls.crossJoin(zs).crossJoin(hits)
      .select(col("files_linear"), col("rows_linear"),
        col("files_zorder"), col("rows_zorder"), col("rows_selected"))
  }

  /** Compaction / split plan for a small-file inventory: within each
    * table partition, files are walked in id order and assigned to
    * bins by cumulative size — bin = floor(exclusive-running-sum /
    * target) — so every bin holds ~target bytes and the thousand
    * 1 MB files a streaming ingest leaves behind become a handful of
    * rewrite groups. This is the offset-packing idealization of
    * Spark's own FilePartition planning (maxPartitionBytes): a bin
    * may overflow by less than one file, never undershoot-fragment.
    * One window per PARTITION (never global — the plan parallelizes
    * across partitions exactly like the rewrite it schedules) and
    * fully deterministic, so the DuckDB oracle replays it.
    *
    * Returns one row per file: (partition, file_id, size, bin). */
  def compactionPlan(files: DataFrame, partCol: Column, fileIdCol: Column,
                     sizeCol: Column, target: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prior = Window.partitionBy(col("part")).orderBy(col("file_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files.select(partCol.as("part"), fileIdCol.as("file_id"),
        sizeCol.as("size"))
      .withColumn("bin",
        floor(coalesce(sum(col("size")).over(prior), lit(0L)) / target)
          .cast("long"))
  }

  /** Hash position `seed` of `key` in a bloom bit space of `mBits`
    * bits: [[Curation.slot16]] — the ONE engine-portable md5 slot
    * recipe, not a second copy that could drift — over "key#seed",
    * mod mBits. slot16 spans 65536 values and mBits is required to
    * divide 65536, so the mod is unbiased. */
  private def bloomPos(key: Column, seed: Int, mBits: Int): Column =
    pmod(Curation.slot16(concat(key.cast("string"), lit("#" + seed))),
      lit(mBits.toLong))

  /** Emit each key's k bloom bits as packed-word coordinates:
    * (word_idx, mask) with 32 bits per BIGINT word (32, not 64, so
    * the mask stays positive on engines whose `<<` is signed). */
  private def bloomBits(df: DataFrame, keyCol: Column,
                        mBits: Int, k: Int): DataFrame = {
    require(65536 % mBits == 0, s"mBits=$mBits must divide 65536")
    df.withColumn("__pos",
        explode(array((0 until k).map(j =>
          bloomPos(keyCol, j, mBits)): _*)))
      .withColumn("word_idx", (col("__pos") / lit(32)).cast("int"))
      .withColumn("mask",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 32 AS INT))"))
      .drop("__pos")
  }

  /** Per-block bloom filter index over a point-lookup key — the
    * file-footer structure that prunes POINT predicates the way zone
    * maps ([[zonemap2]]) prune ranges: high-cardinality unordered
    * keys (user ids, part keys) have useless min/max boxes, but a
    * few thousand bits per file answer "might this file contain key
    * x" with no false negatives.
    *
    * Representation: (block, word_idx, word) — mBits bits packed 32
    * per BIGINT word, built by one (block, word)-keyed `bit_or`
    * aggregate over k exploded bit positions per row. Bounded output
    * (blocks × mBits/32 rows max), map-side combinable, plain
    * codegen shift/mask arithmetic end to end — and, because the
    * hash is md5-based ([[bloomPos]]), reproducible bit for bit by
    * the DuckDB oracle. */
  def bloomIndex(df: DataFrame, blockCol: Column, keyCol: Column,
                 mBits: Int = 4096, k: Int = 3): DataFrame =
    bloomBits(df.select(blockCol.as("block"), keyCol.cast("long").as("key")),
        col("key"), mBits, k)
      .groupBy("block", "word_idx")
      .agg(expr("bit_or(mask)").as("word"))

  /** Point-lookup skipping report: for each probe key, how many
    * blocks the bloom index says MUST be scanned (maybe_blocks) vs
    * the blocks that truly contain the key (exact_blocks), plus
    * false_neg — blocks containing the key that bloom would skip,
    * structurally zero (the no-false-negative bloom contract, which
    * makes the column an in-row cross-engine check).
    *
    * Shape: probe keys are contract-small (a handful of point
    * lookups), so their k bit requirements broadcast to the index;
    * a block qualifies iff EVERY needed word has all needed bits set
    * (absent word rows are all-zero words — the anti-joined
    * remainder fails the word count). No pair explosion: the join
    * fan-out is |probes| × blocks × words-per-probe, all bounded.
    * `probes` supplies the lookup keys in the column named
    * `probeCol` (castable to long). */
  def bloomSkipStats(df: DataFrame, blockCol: Column, keyCol: Column,
                     probes: DataFrame, probeCol: String = "probe_key",
                     mBits: Int = 4096, k: Int = 3): DataFrame = {
    val base = df.select(blockCol.as("block"), keyCol.cast("long").as("key"))
    val index = bloomIndex(df, blockCol, keyCol, mBits, k)
    val p = probes.select(col(probeCol).cast("long").as("probe_key"))
    // per probe: needed (word_idx, bits) — k bits may share a word
    val need = bloomBits(p, col("probe_key"), mBits, k)
      .groupBy("probe_key", "word_idx")
      .agg(expr("bit_or(mask)").as("need"))
    val nWords = need.groupBy("probe_key").agg(count(lit(1)).as("__nw"))
    val maybe = need.join(index, Seq("word_idx"))
      .filter(col("word").bitwiseAND(col("need")) === col("need"))
      .groupBy("probe_key", "block").agg(count(lit(1)).as("__ok"))
      .join(nWords, "probe_key")
      .filter(col("__ok") === col("__nw"))
      .select("probe_key", "block")
    val exact = base.join(p, col("key") === col("probe_key"))
      .select("probe_key", "block").distinct()
    val falseNeg = exact.except(maybe)
      .groupBy("probe_key").agg(count(lit(1)).as("false_neg"))
    val totals = base.select("block").distinct()
      .agg(count(lit(1)).as("n_blocks"))
    p.crossJoin(broadcast(totals)) // 1-row totals (the audited shape)
      .join(exact.groupBy("probe_key").agg(count(lit(1)).as("exact_blocks")),
        Seq("probe_key"), "left")
      .join(maybe.groupBy("probe_key").agg(count(lit(1)).as("maybe_blocks")),
        Seq("probe_key"), "left")
      .join(falseNeg, Seq("probe_key"), "left")
      .select(col("probe_key"), col("n_blocks"),
        coalesce(col("exact_blocks"), lit(0L)).as("exact_blocks"),
        coalesce(col("maybe_blocks"), lit(0L)).as("maybe_blocks"),
        coalesce(col("false_neg"), lit(0L)).as("false_neg"),
        graft.ops.Ops.roundDet(lit(1.0) -
          coalesce(col("maybe_blocks"), lit(0L)).cast("double") /
            col("n_blocks"), 4).as("skipped_frac"))
      .orderBy("probe_key")
  }
}
