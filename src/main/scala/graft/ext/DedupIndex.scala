package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stored MinHash-LSH dedup index — the x9 build/probe split
  * ([[AnnIndex]]) applied to the incremental near-dup gate:
  * [[Dedup.minhashIncrementalNearDups]] recomputes the full-corpus
  * signature/banding/bucket table on EVERY batch — O(corpus) per
  * probe — which is exactly the cost a 100 TB ingest pipeline cannot
  * pay per increment. [[build]] persists the corpus bucket table as
  * a parquet asset; [[probe]] bands only the BATCH and equi-joins
  * the stored buckets, so probe cost is O(batch + candidates). The
  * exact-Jaccard verification reads corpus TEXT for candidate ids
  * only (an id semi-join riding the parquet scan): the index holds
  * signatures, the corpus store holds documents — the standard
  * split.
  *
  * Bucket rows are stored PARTIAL (grouped per build/append shard,
  * never capped at rest); [[probe]] regroups the shards matching the
  * batch's keys and applies `maxBucket` to the MERGED bucket. This
  * ordering is load-bearing: capping at build time would let an
  * append resurrect a dropped over-cap bucket with only its new ids,
  * emitting candidates the one-shot gate over the union corpus would
  * not — probe-side capping keeps stored-index results IDENTICAL to
  * [[Dedup.minhashIncrementalNearDups]] at any append history, which
  * is what the d15 consistency contract asserts (and the probe runs
  * [[Dedup.verifyMinhashCandidates]] — the same verification code
  * path, not a reimplementation).
  *
  * Durability discipline is [[AnnIndex]]'s verbatim: meta is deleted
  * first / written last (the commit marker — a crash mid-build or
  * mid-append leaves a validation-failing index, never a half-built
  * one), [[ensure]] validates by content fingerprint (one corpus
  * scan) or, with an explicit `version`, by a 1-row meta read — the
  * zero-scan serve posture. [[append]]'s write side is O(batch):
  * new shards append, and the XOR-fold fingerprint updates without
  * a corpus scan (fingerprint(old ∪ batch) = fingerprint(old) XOR
  * fingerprint(batch)); its default new-id check reads the stored
  * shard id lists (index-sized — see the method scaladoc). Long
  * append chains accrete small shard files — the z4 compaction
  * pressure; the fix is a periodic [[build]] rewrite.
  */
object DedupIndex {

  /** Deterministic per-corpus index location (see [[AnnIndex.dirFor]]
    * for why repo-local, not /tmp): the `d15_` prefix keeps this
    * index family disjoint from x9's under a shared
    * SPARK_GRAFT_INDEX_ROOT. */
  def dirFor(sfDir: String): String =
    sys.env.getOrElse("SPARK_GRAFT_INDEX_ROOT",
      new java.io.File("target/d15-index").getAbsolutePath) +
      "/d15_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  /** Corpus identity row: the same order-insensitive XOR-fold
    * fingerprint as [[AnnIndex]], over (id, text). Ids are integral
    * (long-castable) by contract — AnnIndex's contract too — so the
    * meta's max_id/fingerprint arithmetic is well-typed; [[append]]
    * rejects a batch whose identity degenerates (empty, or
    * non-integral ids nulling the cast) BEFORE touching the commit
    * marker. */
  private def identity(corpus: DataFrame, textCol: String,
                       idCol: String): DataFrame =
    corpus.select(col(idCol).cast("long").as("__id"),
        col(textCol).as("__t"))
      .agg(count(lit(1)).as("n_rows"),
        max(col("__id")).as("max_id"),
        expr("bit_xor(xxhash64(__id, __t))").as("fingerprint"))

  private def metaPathOf(corpus: DataFrame, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/meta")
    (p, p.getFileSystem(
      corpus.sparkSession.sparkContext.hadoopConfiguration))
  }

  /** One shard of partial bucket rows: (band, bhash, ids sorted
    * within the shard). Never capped — see the object scaladoc. */
  private def shardOf(df: DataFrame, textCol: String,
                      idCol: String): DataFrame =
    Dedup.bandedOf(df, textCol, idCol)
      .groupBy("band", "bhash")
      .agg(array_sort(collect_list(col("id"))).as("ids"))

  /** Build (or rebuild) the index at `dir`: ONE full-corpus
    * signature/banding pass — the cost every probe then skips. */
  def build(corpus: DataFrame, dir: String,
            textCol: String = "text", idCol: String = "doc_id",
            version: Option[String] = None): Unit = {
    val (metaPath, fs) = metaPathOf(corpus, dir)
    fs.delete(metaPath, true) // invalidate first (commit marker)
    shardOf(corpus, textCol, idCol)
      .write.mode("overwrite").parquet(s"$dir/buckets")
    identity(corpus, textCol, idCol)
      .withColumn("version", lit(version.orNull).cast("string"))
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Validate the stored index against the live corpus; build when
    * missing or stale. Returns true when a build ran. `version`
    * picks the validation posture exactly as [[AnnIndex.ensure]]
    * does: None = content fingerprint (one corpus scan), Some(v) =
    * 1-row meta read, zero corpus scans on the serve path. */
  def ensure(corpus: DataFrame, dir: String,
             textCol: String = "text", idCol: String = "doc_id",
             version: Option[String] = None): Boolean = {
    val spark = corpus.sparkSession
    val fresh =
      try {
        val meta = spark.read.parquet(s"$dir/meta")
        version match {
          case Some(v) => meta.select("version").head.getString(0) == v
          case None =>
            meta.select("n_rows", "max_id", "fingerprint").head ==
              identity(corpus, textCol, idCol).head
        }
      } catch { case _: Throwable => false }
    if (!fresh) build(corpus, dir, textCol, idCol, version)
    !fresh
  }

  /** Near-dup gate for a batch against the STORED corpus buckets:
    * band the batch, semi-join the stored shards down to the batch's
    * (band, bhash) keys, merge + cap those buckets, then run the
    * shared exact-Jaccard verification (corpus text read for
    * candidate ids only). Returns (batch_id, corpus_id, jaccard),
    * identical to [[Dedup.minhashIncrementalNearDups]] on the
    * indexed corpus. */
  def probe(batch: DataFrame, dir: String, corpus: DataFrame,
            threshold: Double,
            textCol: String = "text", idCol: String = "doc_id",
            broadcastVerify: Boolean = true,
            maxBucket: Int = 1024): DataFrame = {
    val spark = batch.sparkSession
    val batchBuckets = Dedup.bandBuckets(batch, textCol, idCol,
      "bids", maxBucket).localCheckpoint()
    val corpusSide = spark.read.parquet(s"$dir/buckets")
      .join(batchBuckets.select("band", "bhash"),
        Seq("band", "bhash"), "left_semi")
      .groupBy("band", "bhash")
      .agg(array_sort(flatten(collect_list(col("ids")))).as("cids"))
      .filter(size(col("cids")) <= maxBucket)
    val cands = batchBuckets
      .join(corpusSide, Seq("band", "bhash"))
      .select(explode(col("bids")).as("batch_id"), col("cids"))
      .select(col("batch_id"), explode(col("cids")).as("corpus_id"))
      .distinct()
      .localCheckpoint()
    Dedup.verifyMinhashCandidates(cands, batch, corpus, threshold,
      textCol, idCol, broadcastVerify)
  }

  /** Append a batch of NEW documents: one shard of partial bucket
    * rows appends, and the meta fingerprint updates by XOR — the
    * WRITE side never touches the corpus, so with `checkIds = false`
    * (callers whose batches already passed the d7 incremental-dedup
    * anti-join) the append is O(batch). Batch ids must be new
    * ([[AnnIndex.append]]'s contract, same reasoning: a re-appended
    * id doubles its bucket entries AND cancels its fingerprint
    * term); the default `checkIds` enforces it with a keys-only pass
    * over the stored shard id lists (the compact bucket asset, never
    * the corpus) semi-joined against the broadcast batch id set —
    * index-sized, not corpus-text-sized, but not O(batch). */
  def append(batch: DataFrame, dir: String,
             textCol: String = "text", idCol: String = "doc_id",
             checkIds: Boolean = true): Unit = {
    val spark = batch.sparkSession
    val (metaPath, fs) = metaPathOf(batch, dir)
    if (checkIds) {
      val overlap = spark.read.parquet(s"$dir/buckets")
        .select(explode(col("ids")).as("id"))
        .join(broadcast(batch.select(col(idCol).cast("long").as("id"))
          .distinct()), "id")
        .limit(1).count()
      require(overlap == 0L,
        "DedupIndex.append: batch contains ids already indexed")
    }
    val oldMeta = spark.read.parquet(s"$dir/meta")
      .select("n_rows", "max_id", "fingerprint", "version").head
    val bid = identity(batch, textCol, idCol).head
    // guard BEFORE the commit marker: an empty batch (or ids that
    // null the long cast) must not invalidate a good index
    require(bid.getLong(0) > 0L && !bid.isNullAt(1) && !bid.isNullAt(2),
      "DedupIndex.append: batch is empty or has non-integral ids")
    fs.delete(metaPath, true) // invalidate first (commit marker)
    shardOf(batch, textCol, idCol)
      .write.mode("append").parquet(s"$dir/buckets")
    // the 1-row merged meta, in AnnIndex.append's lit-select idiom —
    // one meta contract, one construction style across both indexes
    spark.range(1).select(
        lit(oldMeta.getLong(0) + bid.getLong(0)).as("n_rows"),
        lit(math.max(oldMeta.getLong(1), bid.getLong(1))).as("max_id"),
        lit(oldMeta.getLong(2) ^ bid.getLong(2)).as("fingerprint"),
        lit(oldMeta.getString(3)).cast("string").as("version"))
      .write.mode("overwrite").parquet(s"$dir/meta")
  }
}
