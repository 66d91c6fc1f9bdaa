package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stored inverted index with BM25 serving — the third family on the
  * [[StoredIndex]] spine, closing the retrieval matrix: [[AnnIndex]]
  * serves dense (embedding) queries, [[DedupIndex]] serves identity
  * (near-dup) probes, this serves LEXICAL queries. The build/serve
  * split is the same one [[Relevance.bm25TopDocs]] motivates in
  * reverse: that operator re-tokenizes the whole corpus per query —
  * O(corpus text) per probe, the cost a 100 TB serving path cannot
  * pay — while [[build]] pays the tokenize ONCE into two keys-only
  * assets and [[probe]] reads only the query terms' postings slice.
  *
  * Assets (both id-keyed longs, corpus text never stored):
  *  - `postings/` — one (term, id, tf) row per distinct term per
  *    document. Build clusters rows by term range
  *    (`repartitionByRange` + sort), so every file covers a narrow
  *    term interval and a probe's `term IN (…)` predicate prunes at
  *    the parquet row-group level — the scan reads the matched
  *    terms' neighborhoods, not the index. Appends accrete
  *    unclustered shards; [[compact]] restores the clustering.
  *  - `doclens/` — one (id, dl) row per document (dl = Σ tf, derived
  *    from the postings shard — the corpus text is tokenized exactly
  *    once per build/append). Serves the BM25 length normalization,
  *    the zero-score tail of a short result page, and doubles as the
  *    family's cheap id list for guards and live-id views.
  *
  * [[probe]] is bit-exact against [[Relevance.bm25TopDocs]] over the
  * live corpus BY CONSTRUCTION: both build the same fixed-shape
  * score tree ([[Relevance.bm25Score]] — shared code, not a twin),
  * df/N/Σdl reduce over the same live sets, candidates follow the
  * same two-phase partial top-k, and documents containing NO query
  * term (score exactly 0.0 after the shared rounding) fill the tail
  * of a short page in the same doc_id order — so the k1/k2/k3/k4
  * registry rows run against the SAME DuckDB oracle SQL as t7, which
  * makes this the one index family whose whole lifecycle is
  * DuckDB-oracled, not contract-twinned.
  *
  * Durability, guards, retraction, compaction, shard merge/absorb
  * and staged rebuild are [[StoredIndex]]'s protocol verbatim (meta
  * commit marker first/last, XOR fingerprint algebra, superset id
  * bloom, tombstone LSM split) — see [[DedupIndex]] for the
  * narrative; only the asset shapes differ here.
  */
object KeywordIndex {

  /** Deterministic per-corpus index location (the `kw_` prefix keeps
    * this family disjoint from x9's/d15's under a shared
    * SPARK_GRAFT_INDEX_ROOT). */
  def dirFor(sfDir: String): String =
    StoredIndex.dirFor("target/kw-index", "kw_", sfDir)

  private def identity(corpus: DataFrame, textCol: String,
                       idCol: String): DataFrame =
    StoredIndex.identityOf(corpus, col(idCol).cast("long"), col(textCol))

  private def idsOf(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"))

  /** One postings shard: (term, id, tf) — ONE tokenize pass
    * ([[TextAnalysis.tokens]], the same whitespace split every text
    * operator and oracle uses), then a (term, id)-keyed count. */
  private def postingsOf(df: DataFrame, textCol: String,
                         idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term", "id").agg(count(lit(1L)).as("tf"))

  /** Doc lengths derived from a postings frame: dl = Σ tf equals
    * `size(tokens(text))` exactly (every token lands in exactly one
    * (term, id) group), so the corpus text is never read twice. */
  private def doclensOf(postings: DataFrame): DataFrame =
    postings.groupBy("id").agg(sum(col("tf")).as("dl"))

  private def clusterPostings(df: DataFrame): DataFrame =
    df.repartitionByRange(col("term")).sortWithinPartitions("term", "id")

  /** Build (or rebuild) the index at `dir`: the ONE corpus tokenize
    * pass every probe then skips. Postings land term-range-clustered
    * (probe-side row-group pruning); doclens derive from the written
    * postings — a keys-only re-read, not a second text scan. */
  def build(corpus: DataFrame, dir: String,
            textCol: String = "text", idCol: String = "doc_id",
            version: Option[String] = None): Unit = {
    val spark = corpus.sparkSession
    StoredIndex.invalidate(spark, dir) // commit marker
    StoredIndex.clearDeleteIds(spark, dir) // rebuild = clean live state
    clusterPostings(postingsOf(corpus, textCol, idCol))
      .write.mode("overwrite").parquet(s"$dir/postings")
    doclensOf(spark.read.parquet(s"$dir/postings"))
      .select("id", "dl")
      .write.mode("overwrite").parquet(s"$dir/doclens")
    StoredIndex.writeIdBloom(spark, dir, idsOf(corpus, idCol))
    StoredIndex.writeMeta(identity(corpus, textCol, idCol), version, dir)
  }

  /** Validate the stored index against the live corpus; build when
    * missing or stale — [[DedupIndex.ensure]]'s contract verbatim
    * (content fingerprint scan, or 1-row meta read under an explicit
    * `version`). Returns true when a build ran. */
  def ensure(corpus: DataFrame, dir: String,
             textCol: String = "text", idCol: String = "doc_id",
             version: Option[String] = None): Boolean = {
    val fresh = StoredIndex.isFresh(corpus.sparkSession, dir, version,
      identity(corpus, textCol, idCol).head)
    if (!fresh) build(corpus, dir, textCol, idCol, version)
    !fresh
  }

  /** Serve-while-rebuilding rebuild — [[AnnIndex.rebuildStaged]]'s
    * lexical twin: the full fresh build lands in a staging dir while
    * the live assets keep serving probes, then the swap is a
    * rename-sized window. */
  def rebuildStaged(corpus: DataFrame, dir: String,
                    textCol: String = "text", idCol: String = "doc_id",
                    version: Option[String] = None): Unit = {
    val spark = corpus.sparkSession
    val staging = StoredIndex.freshStaging(spark, dir)
    build(corpus, staging, textCol, idCol, version)
    StoredIndex.swapStaged(spark, dir, Seq("postings", "doclens"))
  }

  /** BM25 top-N from the stored form. Per-probe cost is O(matched
    * postings + doclens keys): the postings scan carries a
    * `term IN (…)` pushdown (row-group-pruned once [[compact]] has
    * term-clustered the files), df/N/Σdl reduce to two one-row
    * frames that broadcast back, candidates pre-truncate per
    * partition before the single bounded rank window, and documents
    * with no query term enter only as the topN-smallest-id zero-fill
    * (orderBy+limit — TakeOrderedAndProject, no corpus window), so a
    * short result page still matches the in-query scorer's full
    * ranking bit-for-bit. The corpus text is never read.
    *
    * `terms` must be distinct (a repeated query term would double
    * its score term in ways no oracle reproduces). */
  def probe(spark: SparkSession, dir: String, terms: Seq[String],
            topN: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "KeywordIndex.probe needs at least one term")
    require(terms.distinct == terms,
      "KeywordIndex.probe: query terms must be distinct")
    val dels = StoredIndex.readDeleteIds(spark, dir)
    val slice = StoredIndex.filterTombstones(dels,
      spark.read.parquet(s"$dir/postings")
        .filter(col("term").isin(terms: _*)), "id")
    val lens = StoredIndex.filterTombstones(dels,
      spark.read.parquet(s"$dir/doclens"), "id")

    // one-row live-corpus stats + one-row per-term document
    // frequencies (postings are one row per (term, doc), so df is a
    // plain conditional count over the matched slice)
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl"))
    val dfs = slice.agg(
      coalesce(sum(when(col("term") === lit(terms.head), 1L)), lit(0L))
        .as("df_0"),
      terms.zipWithIndex.tail.map { case (t, i) =>
        coalesce(sum(when(col("term") === lit(t), 1L)), lit(0L))
          .as(s"df_$i")
      }: _*)

    // candidates: docs holding ≥1 query term, tf pivoted to the
    // fixed term order the shared score tree expects
    val tfs = slice.groupBy("id").agg(
      coalesce(sum(when(col("term") === lit(terms.head), col("tf"))),
        lit(0L)).as("tf_0"),
      terms.zipWithIndex.tail.map { case (t, i) =>
        coalesce(sum(when(col("term") === lit(t), col("tf"))), lit(0L))
          .as(s"tf_$i")
      }: _*)
    val cand = tfs.join(lens, Seq("id"))
      .join(broadcast(stats)).join(broadcast(dfs))
      .withColumn("score", Relevance.bm25Score(terms.size, k1, b))

    // two-phase partial top-k (the bruteForceTopK/t7 pattern), then
    // the zero-score tail: non-candidates score exactly 0.0 under
    // the shared rounding, so the global page is candidates-first,
    // ties and zeros by doc_id — the topN smallest non-candidate ids
    // are a superset of every zero that can reach the page
    val wPart = Window.partitionBy(col("__pid"))
      .orderBy(col("score").desc, col("id").asc)
    val candTop = cand
      .withColumn("__pid", spark_partition_id())
      .withColumn("__prank", row_number().over(wPart))
      .filter(col("__prank") <= topN)
      .select(col("id"), col("score"))
    val zeros = lens.join(tfs.select("id"), Seq("id"), "left_anti")
      .select(col("id"), lit(0.0).as("score"))
      .orderBy(col("id")).limit(topN)
    val w = Window.orderBy(col("score").desc, col("id").asc)
    candTop.unionByName(zeros)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("rank"), col("id").as("doc_id"), col("score"))
      .orderBy("rank")
  }

  /** Append a batch of NEW documents — O(batch) end-to-end: one
    * tokenize pass over the batch, two shard appends, XOR meta
    * merge, driver-side bloom union; the corpus and the stored
    * assets are never rewritten. Batch ids must be new
    * ([[DedupIndex.append]]'s contract and bloom-gated guard — the
    * id list read on suspicion is `doclens`, one row per doc, not
    * the postings). */
  def append(batch: DataFrame, dir: String,
             textCol: String = "text", idCol: String = "doc_id",
             checkIds: Boolean = true): Unit = {
    val spark = batch.sparkSession
    if (checkIds)
      StoredIndex.requireNewIds(spark, dir, idsOf(batch, idCol),
        spark.read.parquet(s"$dir/doclens").select("id"),
        "KeywordIndex.append")
    val oldMeta = spark.read.parquet(s"$dir/meta").head
    val bid = identity(batch, textCol, idCol).head
    require(bid.getLong(0) > 0L && !bid.isNullAt(1) && !bid.isNullAt(2),
      "KeywordIndex.append: batch is empty or has non-integral ids")
    // batch-sized materialization so the doclens derivation reuses
    // the tokenize pass instead of re-running it
    val shard = postingsOf(batch, textCol, idCol).localCheckpoint()
    StoredIndex.invalidate(spark, dir) // commit marker
    shard.write.mode("append").parquet(s"$dir/postings")
    doclensOf(shard).select("id", "dl")
      .write.mode("append").parquet(s"$dir/doclens")
    StoredIndex.mergeIdBloom(spark, dir, idsOf(batch, idCol))
    StoredIndex.writeMergedMeta(spark, dir, oldMeta, bid)
  }

  /** Live indexed ids — doclens (one row per doc) minus tombstones. */
  def liveIndexedIds(spark: SparkSession, dir: String): DataFrame =
    StoredIndex.filterTombstones(spark, dir,
      spark.read.parquet(s"$dir/doclens").select("id"), "id")

  /** Retract documents WITHOUT rewriting the assets —
    * [[AnnIndex.remove]]'s contract verbatim (tombstone LSM split,
    * XOR un-mix, re-append only after a compact). `removed` must
    * carry (id, text), one row per id, every id live. */
  def remove(removed: DataFrame, dir: String,
             textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val spark = removed.sparkSession
    StoredIndex.removeIds(spark, dir,
      idsOf(removed, idCol).distinct().localCheckpoint(),
      identity(removed, textCol, idCol).head,
      liveIndexedIds(spark, dir), "KeywordIndex.remove")
  }

  /** Rewrite the accreted append shards back into term-range-
    * clustered postings files (restoring probe-side row-group
    * pruning) and a deduplicated doclens asset, materializing any
    * pending tombstones. Two [[StoredIndex.compactAsset]] windows,
    * ordered so a crash between them stays consistent: postings
    * compact first WITHOUT dropping `deletes/` (doclens rows for the
    * retracted ids still exist and still need the tombstone filter);
    * the doclens compact then materializes the same deletions, drops
    * the tombstones, and re-mints the id bloom from the surviving
    * doc ids (the FPP-drift remedy, see [[AnnIndex.compact]]). */
  def compact(spark: SparkSession, dir: String): Unit = {
    val dels = StoredIndex.readDeleteIds(spark, dir)
    StoredIndex.compactAsset(spark, dir, "postings",
      df => clusterPostings(StoredIndex.filterTombstones(dels, df, "id")))
    StoredIndex.compactAsset(spark, dir, "doclens",
      df => StoredIndex.filterTombstones(dels, df, "id")
        .repartitionByRange(col("id")).sortWithinPartitions("id"),
      dropAssets = if (dels.isDefined) Seq("deletes") else Nil,
      liveIdsOf =
        if (dels.isDefined) Some(df => df.select("id")) else None)
  }

  /** [[compact]] only when either asset has accreted past `maxFiles`
    * part files — the self-maintenance hook a streaming ingest calls
    * after each append. Returns true when a compaction ran. */
  def maybeCompact(spark: SparkSession, dir: String,
                   maxFiles: Int = 64): Boolean = {
    val p = StoredIndex.compactIfAccreted(spark, dir, "postings",
      maxFiles, clusterPostings)
    val d = StoredIndex.compactIfAccreted(spark, dir, "doclens",
      maxFiles,
      df => df.repartitionByRange(col("id")).sortWithinPartitions("id"))
    p || d
  }

  /** Merge independently built shard indexes into one —
    * [[DedupIndex.merge]]'s protocol on this family's assets: file
    * copies for postings/doclens/deletes, driver-side bloom union,
    * folded meta. Shards must not share raw doc ids; the default
    * guard distinct-counts the (cheap, one-row-per-doc) doclens
    * ids. */
  def merge(spark: SparkSession, shardDirs: Seq[String],
            outDir: String, checkIds: Boolean = true,
            version: Option[String] = None): Unit = {
    require(shardDirs.nonEmpty, "KeywordIndex.merge: no shards")
    require(!shardDirs.contains(outDir),
      "KeywordIndex.merge: outDir must not be one of the shards")
    val metas = shardDirs.map(d =>
      StoredIndex.readMeta(spark, d).getOrElse(
        throw new IllegalStateException(
          s"KeywordIndex.merge: shard $d has no committed meta — " +
            "finish (or rerun) its build before merging")))
    if (checkIds && shardDirs.size > 1) {
      val dup = shardDirs.map(d =>
          spark.read.parquet(s"$d/doclens").select("id"))
        .reduce(_ unionByName _)
        .groupBy("id").count().filter(col("count") > 1)
        .limit(1).count()
      require(dup == 0L,
        "KeywordIndex.merge: shards share raw doc id(s) — slices " +
          "must be disjoint (tombstoned ids included)")
    }
    StoredIndex.invalidate(spark, outDir)
    StoredIndex.fsOf(spark, outDir)
      .delete(new org.apache.hadoop.fs.Path(outDir), true)
    shardDirs.zipWithIndex.foreach { case (d, i) =>
      StoredIndex.copyAssetFiles(spark, s"$d/postings",
        s"$outDir/postings", s"s${i}_")
      StoredIndex.copyAssetFiles(spark, s"$d/doclens",
        s"$outDir/doclens", s"s${i}_")
      StoredIndex.copyAssetFiles(spark, s"$d/deletes",
        s"$outDir/deletes", s"s${i}_")
    }
    val blooms = shardDirs.map(d =>
      StoredIndex.readIdBloomAsset(spark, d))
    if (blooms.forall(_.isDefined)) // else: a pre-bloom shard — omit
      StoredIndex.writeBloomBytes(spark, outDir,
        blooms.flatMap(_.get) match {
          case Nil => null // every shard provably empty
          case live => StoredIndex.mergedBloomBytes(live)
        })
    StoredIndex.writeFoldedMeta(spark, outDir, metas, version)
  }

  /** Ingest a built shard index INTO a live index in place —
    * [[DedupIndex.absorb]]'s O(shard) bulk-load tail on this
    * family's assets; guard, crash posture and bloom algebra
    * identical. */
  def absorb(spark: SparkSession, shardDir: String, dir: String,
             checkIds: Boolean = true): Unit = {
    require(shardDir != dir, "KeywordIndex.absorb: shard IS the target")
    val dirMeta = StoredIndex.readMeta(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"KeywordIndex.absorb: target $dir has no committed meta — " +
          "build it first (or use merge into a fresh dir)"))
    val shardMeta = StoredIndex.readMeta(spark, shardDir).getOrElse(
      throw new IllegalStateException(
        s"KeywordIndex.absorb: shard $shardDir has no committed meta — " +
          "finish (or rerun) its build before absorbing"))
    if (checkIds)
      StoredIndex.requireNewIds(spark, dir,
        spark.read.parquet(s"$shardDir/doclens").select("id"),
        spark.read.parquet(s"$dir/doclens").select("id"),
        "KeywordIndex.absorb")
    val shardBloom = StoredIndex.readIdBloomAsset(spark, shardDir)
    StoredIndex.invalidate(spark, dir) // commit marker
    StoredIndex.copyAssetFiles(spark, s"$shardDir/postings",
      s"$dir/postings", "ab_")
    StoredIndex.copyAssetFiles(spark, s"$shardDir/doclens",
      s"$dir/doclens", "ab_")
    StoredIndex.copyAssetFiles(spark, s"$shardDir/deletes",
      s"$dir/deletes", "ab_")
    (StoredIndex.readIdBloomAsset(spark, dir), shardBloom) match {
      case (None, _) => () // pre-bloom target stays pre-bloom
      case (Some(_), None) =>
        StoredIndex.fsOf(spark, dir)
          .delete(new org.apache.hadoop.fs.Path(s"$dir/idbloom"), true)
      case (Some(a), Some(b)) =>
        StoredIndex.writeBloomBytes(spark, dir,
          (a.toList ++ b.toList) match {
            case Nil => null
            case one :: Nil => one
            case both => StoredIndex.mergedBloomBytes(both)
          })
    }
    StoredIndex.writeFoldedMeta(spark, dir, Seq(dirMeta, shardMeta),
      version = None)
  }

  /** Operational health report — the families' shared (metric,
    * value) frame over this index's assets (corpus text never read):
    * physical postings rows vs live entries (append/compact
    * accretion debt is doclens-side here: a doc's postings are
    * unique per (term, id) by construction, so `n_posting_rows` >
    * `n_entries_live` only under pending tombstones), the live
    * df histogram (`max_df` near `n_docs_live` = a stopword-heavy
    * vocabulary inflating every probe's slice), token mass, and the
    * retraction/guard gauges. */
  def health(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Ops.roundDet
    import StoredIndex.{litMetricRow, metricRow, tombstoneMetricRow}
    val raw = spark.read.parquet(s"$dir/postings")
    val deletes = StoredIndex.readDeleteIds(spark, dir)
    val entries = StoredIndex.filterTombstones(deletes, raw, "id")
    val lens = StoredIndex.filterTombstones(deletes,
      spark.read.parquet(s"$dir/doclens"), "id")
    val perTerm = entries.groupBy("term").agg(count(lit(1L)).as("df"))
    val bloomPresent =
      if (StoredIndex.readIdBloom(spark, dir).isDefined) 1d else 0d
    Seq(
      metricRow("avg_df", perTerm, roundDet(avg(col("df")), 4)),
      litMetricRow(spark, "bloom_present", bloomPresent),
      metricRow("max_df", perTerm, max(col("df"))),
      metricRow("n_docs_live", lens, count(lit(1L))),
      metricRow("n_entries_live", entries, count(lit(1L))),
      metricRow("n_posting_rows", raw, count(lit(1L))),
      metricRow("n_terms_live", perTerm, count(lit(1L))),
      metricRow("sum_dl_live", lens, sum(col("dl")).cast("double")),
      tombstoneMetricRow(spark, dir)
    ).reduce(_ unionByName _).orderBy("metric")
  }

  /** The health frame a FRESH build of `corpus` must report, derived
    * through the in-query tokenize path without touching any stored
    * asset — [[health]]'s independent oracle (the k5 registry row
    * pins stored ≡ derived). */
  def healthFromCorpus(corpus: DataFrame,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    import graft.ops.Ops.roundDet
    import StoredIndex.{litMetricRow, metricRow}
    val spark = corpus.sparkSession
    val entries = postingsOf(corpus, textCol, idCol)
    val lens = doclensOf(entries)
    val perTerm = entries.groupBy("term").agg(count(lit(1L)).as("df"))
    Seq(
      metricRow("avg_df", perTerm, roundDet(avg(col("df")), 4)),
      litMetricRow(spark, "bloom_present", 1d),
      metricRow("max_df", perTerm, max(col("df"))),
      metricRow("n_docs_live", lens, count(lit(1L))),
      metricRow("n_entries_live", entries, count(lit(1L))),
      metricRow("n_posting_rows", entries, count(lit(1L))),
      metricRow("n_terms_live", perTerm, count(lit(1L))),
      metricRow("sum_dl_live", lens, sum(col("dl")).cast("double")),
      litMetricRow(spark, "n_tombstoned", 0d)
    ).reduce(_ unionByName _).orderBy("metric")
  }
}
