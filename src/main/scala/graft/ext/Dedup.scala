package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication family for training-data pipelines
  * (extension beyond the reference — SURVEY §7.4): exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. Every variant is expressed as
  * DataFrame transformations whose shuffles are keyed on
  * fingerprints/buckets — never an unblocked O(n²) cross join — which
  * is what makes them viable at 100 TB:
  *
  *  - exact:     1 hash-aggregate shuffle on the md5 fingerprint
  *  - MinHash:   per-row signature (no shuffle) → explode bands →
  *               1 shuffle on (band, band-hash) buckets → pairs only
  *               within buckets, then exact-Jaccard verification
  *  - SimHash:   per-row 64-bit signature → pigeonhole block join on
  *               16-bit chunks (hamming ≤ 3 ⇒ some chunk equal)
  *  - n-gram Jaccard: token-explode + equi-join on token, so the
  *               shuffle is keyed by token, not by document pair
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: keep the lowest-id row per content fingerprint.
    * Equivalent semantics to the reference's full-row ROW_NUMBER dedup
    * (SURVEY W1) but keyed on md5(normalized text) so only the key —
    * not the document body — shuffles. */
  def exactByFingerprint(docs: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    docs.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__fp")
  }

  /** Incremental exact dedup — the form corpus-scale ingestion
    * actually runs: dedup a NEW batch against an already-ingested
    * corpus without touching corpus bodies. In-batch survivors
    * (lowest id per fingerprint) anti-join the corpus fingerprint
    * set; only (id, fingerprint) pairs ever shuffle. At 100 TB the
    * corpus side is a persisted fingerprint table appended per batch
    * — the dedup twin of the bronze quarantine's pruned idempotency
    * join — so each increment costs O(batch), not O(corpus). */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    val corpusFps = corpus
      .select(TextAnalysis.fingerprint(col(textCol)).as("__fp")).distinct()
    batch.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(corpusFps, Seq("__fp"), "left_anti")
      .drop("__rn", "__fp")
  }

  /** Bloom-prefiltered incremental dedup — same exact result as
    * [[incrementalDedup]] (asserted by its oracle: a Bloom filter has
    * no false negatives, so prefilter + exact verify = exact), but
    * the corpus anti-join only ever sees the batch rows the filter
    * could not rule out.
    *
    * One pass over the corpus fingerprints builds a single Bloom
    * filter (Spark's own `BloomFilterAggregate`, the engine's
    * runtime-filter sketch; `numBits` caps its size — the driver
    * holds exactly one `numBits/8`-byte object, the same bounded-
    * scalar pattern as the watermark reads). The batch then splits on
    * `might_contain`:
    *
    *  - negatives (the vast majority of a mostly-new batch) are
    *    DEFINITELY absent from the corpus and skip the join entirely
    *    — they never shuffle;
    *  - positives (true duplicates + the configured false-positive
    *    fraction) take the exact fingerprint anti-join.
    *
    * At 100 TB this turns the per-increment cost from "shuffle the
    * whole batch against the corpus fingerprint table" into "shuffle
    * ~dup-rate + FPP of it"; the corpus-side scan still happens once
    * for the filter build, which is the cheapest possible full pass
    * (fingerprints only, one aggregation, no shuffle of bodies). */
  def bloomIncrementalDedup(batch: DataFrame, corpus: DataFrame,
                            expectedItems: Long = 1000000L,
                            numBits: Long = 8388608L,
                            textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{
      BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.ColumnShim
    import org.apache.spark.sql.types.BinaryType

    // materialized (localCheckpoint): consumed twice — bloom build +
    // anti-join — and lazy lineage would re-scan the corpus per
    // consumer, doubling the one full pass this operator budgets
    val corpusFps = corpus
      .select(TextAnalysis.fingerprint(col(textCol)).as("__fp")).distinct()
      .localCheckpoint()
    val bloomAgg = ColumnShim.column(new BloomFilterAggregate(
      new XxHash64(Seq(ColumnShim.expression(col("__fp")))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    // one bounded row: the serialized filter (numBits/8 bytes)
    val bloomBytes = corpusFps.agg(bloomAgg.as("bf"))
      .head().getAs[Array[Byte]](0)

    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    // materialized for the same reason: the might_contain filter and
    // its negation both consume it — without a checkpoint the batch
    // fingerprint+window shuffle runs twice
    val survivors = batch
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .localCheckpoint()
    if (bloomBytes == null) { // empty corpus: everything is new
      survivors.drop("__rn", "__fp")
    } else {
      val mightContain = ColumnShim.column(new BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        new XxHash64(Seq(ColumnShim.expression(col("__fp"))))))
      val definitelyNew = survivors.filter(!mightContain)
      val needsCheck = survivors.filter(mightContain)
        .join(corpusFps, Seq("__fp"), "left_anti")
      definitelyNew.unionByName(needsCheck).drop("__rn", "__fp")
    }
  }

  // -------------------------------------------------------------- MinHash

  /** Number of minhash permutations / LSH bands. 64 hashes × 16 bands
    * of 4 rows ≈ detects Jaccard ≳ 0.5 with high recall. */
  val NumHashes = 64
  val NumBands = 16
  private val RowsPerBand = NumHashes / NumBands

  /** Mersenne prime 2^31-1: universal-hash modulus; products of two
    * 31-bit values stay inside a Long. */
  private val P = 2147483647L

  /** Deterministic (a, b) parameters for the universal hash family
    * h_i(x) = (a_i·x + b_i) mod P, from a fixed LCG — same signature
    * bits on every run and every executor. */
  val hashParams: Seq[(Long, Long)] = {
    var s = 0x5DEECE66DL
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 33) % (P - 1) + 1 }
    Seq.fill(NumHashes)((next(), next()))
  }

  /** Word n-gram shingles over an already-tokenized array column.
    * HOF lambdas evaluate interpreted, so callers materialize the
    * token array in its own projection first — with `split` inlined
    * the text would be re-split per element, O(len²) per document
    * (the c1/TextAnalysis.ngramArrayOfTokens lesson). */
  def shinglesOfTokens(toks: Column, n: Int = 3): Column =
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))

  /** Word n-gram shingles (default 3) of a text column. Convenience
    * form; hot paths project [[TextAnalysis.tokens]] first and use
    * [[shinglesOfTokens]]. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesOfTokens(TextAnalysis.tokens(text), n)

  /** 64-slot MinHash signature of a shingle array: base-hash every
    * shingle into [0, 2^31) with xxhash64, then take the min under
    * each universal-hash permutation — computed in one pass by the
    * custom [[graft.functions.MinHashSignature]] expression (the
    * equivalent HOF formulation re-walks the array 64×, interpreted:
    * ~20× slower at bench scale). */
  def minhashSignature(shingleCol: Column): Column =
    graft.functions.GraftFunctions.minhash_sig(shingleCol, hashParams)

  /** MinHash+LSH near-duplicate candidate pairs, verified by exact
    * Jaccard over the shingle sets. Returns (id_a, id_b, jaccard) with
    * id_a < id_b, jaccard ≥ threshold, deterministically ordered.
    *
    * Plan shape: one fused signature+banding expression per row
    * ([[graft.functions.MinHashBands]]) → explode the 16 band hashes →
    * self-join on (band, hash) carrying ONLY (band, hash, id) through
    * the shuffle → distinct id pairs → re-attach shingle sets for the
    * (tiny) candidate set and verify exact Jaccard. The only O(pairs)
    * work happens on hash-bucket collisions (the LSH guarantee), and
    * the wide shingle arrays never enter the bucket shuffle. */
  /** @param broadcastVerify hint the verification joins broadcast.
    *   Right at the default true while the candidate pair set is small
    *   (the LSH promise on a clean corpus). On a corpus where
    *   candidates blow past executor memory, pass false: the joins
    *   become shuffled hash joins keyed by doc id — same result, and
    *   AQE still downgrades to broadcast at runtime when a side turns
    *   out small.
    * @param maxBucket drop buckets larger than this (the
    *   [[Similarity.lshNearDups]] cap): one degenerate bucket — e.g.
    *   millions of boilerplate near-identical docs all hashing to one
    *   band value — would collect into a single array row and emit
    *   O(bucket²) pairs. A band shared by that many members carries
    *   ~no similarity information, and pairs dropped here remain
    *   findable through their other 15 bands, so the cap bounds the
    *   worst case without a silent recall cliff. A visible dial, not
    *   a hidden truncation. */
  /** The per-row band projection every MinHash variant shares:
    * (id, band, bhash) rows from the fused signature+banding
    * generator. */
  private[ext] def bandedOf(df: DataFrame, textCol: String,
                            idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.GraftFunctions
        .minhash_explode(TextAnalysis.tokens(col(textCol)), hashParams,
          NumBands)
        .as(Seq("band", "bhash")))

  /** Grouped LSH bucket table: one row per (band, bhash) with the
    * SORTED id list, over-cap buckets dropped — the corpus-side
    * asset of the incremental gate and of [[DedupIndex]]. Singleton
    * buckets stay (a lone batch doc can match a lone corpus doc);
    * only degenerate over-cap buckets drop. */
  private[ext] def bandBuckets(df: DataFrame, textCol: String,
                               idCol: String, idsName: String,
                               maxBucket: Int): DataFrame =
    bandedOf(df, textCol, idCol).groupBy("band", "bhash")
      .agg(array_sort(collect_list(col("id"))).as(idsName))
      .filter(size(col(idsName)) <= maxBucket)

  /** Exact shingle-set Jaccard between two shingle-array columns,
    * rounded 4dp — the verification expression every MinHash variant
    * shares. */
  private def jaccardOf(shA: Column, shB: Column): Column =
    graft.ops.Ops.roundDet(
      size(array_intersect(shA, shB)).cast("double") /
      size(array_union(shA, shB)).cast("double"), 4)

  def minhashNearDups(docs: DataFrame, threshold: Double,
                      textCol: String = "text",
                      idCol: String = "doc_id",
                      broadcastVerify: Boolean = true,
                      maxBucket: Int = 1024): DataFrame = {
    val hinted = graft.ops.Ops.maybeBroadcast(broadcastVerify)
    val banded = bandedOf(docs, textCol, idCol)

    // Bucket-grouped pair generation instead of a bucket self-join:
    // ONE aggregation keyed on (band, hash) collects each bucket's
    // (sorted) ids, and the within-bucket pairs are generated by a
    // higher-order expression over that array. The self-join form
    // evaluated the expensive MinHash generator once per join side —
    // and Spark can't reuse the scans because the join may broadcast
    // one side — so the signature pass ran 2× (4× after the
    // candidate-id reuse below). Here the aggregate's exchange is
    // canonically identical everywhere it is consumed, so the
    // signature pass runs once and ReusedExchange serves the rest.
    // Bucket width is bounded by LSH collision behavior exactly as
    // the join build side was, and `maxBucket` caps the degenerate
    // case (see the param doc) so no single hot bucket can emit a
    // quadratic pair volume.
    val buckets = banded.groupBy("band", "bhash")
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    // ids are sorted and bucket-unique, so nested transform emits
    // exactly the id_a < id_b pairs
    // The candidate set is materialized executor-side
    // (localCheckpoint): it is consumed three times below (pair join +
    // both shingle sides), and relying on lazy lineage would re-run
    // the corpus-wide signature pass per consumer (measured 3-4× in
    // the executed plan — exchange reuse does not collapse them). The
    // LSH contract keeps this table tiny relative to the corpus, so
    // materializing it is cheap at any scale; same for the candidate
    // shingle sets right after.
    val cands = buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
      .localCheckpoint()

    // verification cost stays proportional to the candidate set, not
    // the corpus: compute shingles only for docs that appear in a
    // candidate pair (semi-join), then join those to the pairs
    val candIds = cands
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val sh = docs.select(col(idCol).as("id"), col(textCol))
      .join(hinted(candIds), Seq("id"), "left_semi")
      .select(col("id"), TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("id"), shinglesOfTokens(col("__tk")).as("sh"))
      .localCheckpoint()

    cands
      .join(hinted(sh.select(col("id").as("id_a"), col("sh").as("sh_a"))), "id_a")
      .join(hinted(sh.select(col("id").as("id_b"), col("sh").as("sh_b"))), "id_b")
      .withColumn("jaccard", jaccardOf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Incremental MinHash+LSH near-dup detection: candidate pairs
    * BETWEEN a new batch and the existing corpus only — corpus×corpus
    * pairs are never generated (those were found when their docs were
    * ingested), so per-increment cost tracks the batch's collision
    * volume, not the corpus size. This is the near-dup sibling of
    * [[incrementalDedup]]: together they are the ingest-time gate at
    * 100 TB, where re-running [[minhashNearDups]] over the whole
    * corpus per batch would be quadratic over the pipeline's life.
    * At a real deployment the corpus band table is a precomputed
    * signature store this join reads; computing it inline here (the
    * fixture has no store) changes nothing downstream of the store.
    *
    * Plan: BOTH sides group into maxBucket-capped (band, bhash)
    * buckets (the [[minhashNearDups]] rationale, applied
    * symmetrically — capping only the corpus side would leave a
    * boilerplate-heavy BATCH free to put B docs on one band value and
    * emit B × |corpus bucket| candidates; with both caps a degenerate
    * key is bounded at maxBucket² per band before `distinct`, and the
    * dropped pairs remain findable through the other bands exactly as
    * in the symmetric variant); the bucket tables equi-join on
    * (band, bhash) — only (band, bhash, ids) ever shuffles — and each
    * match explodes into (batch_id, corpus_id) candidates, distinct'd
    * and then exact-Jaccard verified with shingles computed ONLY for
    * candidate ids on each side. Returns (batch_id, corpus_id,
    * jaccard ≥ threshold), deterministically ordered. */
  def minhashIncrementalNearDups(batch: DataFrame, corpus: DataFrame,
                                 threshold: Double,
                                 textCol: String = "text",
                                 idCol: String = "doc_id",
                                 broadcastVerify: Boolean = true,
                                 maxBucket: Int = 1024): DataFrame = {
    val cands = bandBuckets(batch, textCol, idCol, "bids", maxBucket)
      .join(bandBuckets(corpus, textCol, idCol, "cids", maxBucket),
        Seq("band", "bhash"))
      .select(explode(col("bids")).as("batch_id"), col("cids"))
      .select(col("batch_id"), explode(col("cids")).as("corpus_id"))
      .distinct()
      .localCheckpoint() // consumed 3× below; see minhashNearDups
    verifyMinhashCandidates(cands, batch, corpus, threshold,
      textCol, idCol, broadcastVerify)
  }

  /** The verification half of the incremental gate, shared with
    * [[DedupIndex.probe]] so the stored-index path runs the IDENTICAL
    * code (the d15 consistency contract is exact by construction):
    * exact shingle-Jaccard for a (batch_id, corpus_id) candidate
    * list, shingling ONLY candidate ids on each side (id semi-joins
    * that ride the scans), thresholded and deterministically
    * ordered. */
  private[ext] def verifyMinhashCandidates(cands: DataFrame,
                                           batch: DataFrame,
                                           corpus: DataFrame,
                                           threshold: Double,
                                           textCol: String, idCol: String,
                                           broadcastVerify: Boolean)
      : DataFrame = {
    val hinted = graft.ops.Ops.maybeBroadcast(broadcastVerify)
    def candShingles(df: DataFrame, ids: DataFrame) = df
      .select(col(idCol).as("id"), col(textCol))
      .join(hinted(ids), Seq("id"), "left_semi")
      .select(col("id"),
        shinglesOfTokens(TextAnalysis.tokens(col(textCol))).as("sh"))
      .localCheckpoint()
    val shB = candShingles(batch,
      cands.select(col("batch_id").as("id")).distinct())
    val shC = candShingles(corpus,
      cands.select(col("corpus_id").as("id")).distinct())
    cands
      .join(hinted(shB.select(col("id").as("batch_id"),
        col("sh").as("sh_a"))), "batch_id")
      .join(hinted(shC.select(col("id").as("corpus_id"),
        col("sh").as("sh_b"))), "corpus_id")
      .withColumn("jaccard", jaccardOf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("batch_id", "corpus_id", "jaccard")
      .orderBy("batch_id", "corpus_id")
  }

  /** Exact shingle-Jaccard for a GIVEN pair list, recomputed through
    * the explode-and-count join path — deliberately NOT the
    * `array_intersect`/`array_union` route [[minhashNearDups]]'s
    * verification uses, so the two formulations check each other.
    * Only docs appearing in a pair are shingled (semi-join), so cost
    * is O(pairs), not O(corpus). Pairs where either side has no
    * shingles in common count 0. Returns (id_a, id_b, jaccard_exact). */
  def shingleJaccardFor(pairs: DataFrame, docs: DataFrame,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val p = pairs.select(col("id_a"), col("id_b"))
    val ids = p.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
    val sh = docs.select(col(idCol).as("id"), col(textCol))
      .join(ids, Seq("id"), "left_semi")
      .select(col("id"), TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("id"), explode(shinglesOfTokens(col("__tk"))).as("shingle"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = p
      .join(sh.select(col("id").as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingle")),
        Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    // LEFT joins throughout: a pair id missing from `docs` must score
    // jaccard_exact = 0 (a contract VIOLATION the caller's filter then
    // surfaces), not silently vanish from the recomputation
    p.join(inter, Seq("id_a", "id_b"), "left")
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"), "left")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"), "left")
      .withColumn("__nc", coalesce(col("n_common"), lit(0L)))
      .withColumn("__den", coalesce(col("n_a"), lit(0L)) +
        coalesce(col("n_b"), lit(0L)) - col("__nc"))
      .select(col("id_a"), col("id_b"),
        when(col("__den") > 0, graft.ops.Ops.roundDet(
          col("__nc").cast("double") / col("__den").cast("double"), 4))
          .otherwise(lit(0.0)).as("jaccard_exact"))
  }

  /** Fused signature + LSH banding — see [[graft.functions.MinHashBands]]. */
  def minhashBands(shingleCol: Column): Column =
    graft.functions.GraftFunctions.minhash_bands(shingleCol, hashParams, NumBands)

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash of the token set: sign of the per-bit sum of
    * token hashes — the one-pass [[graft.functions.SimHash64]]
    * expression. Per-row work only, no shuffle. */
  def simhash(text: Column): Column =
    graft.functions.GraftFunctions.simhash64(TextAnalysis.tokens(text))

  /** SimHash near-duplicate pairs with Hamming distance ≤ maxDist.
    * Pigeonhole blocking: split the 64-bit signature into maxDist+1
    * chunks; any pair within distance maxDist agrees on at least one
    * chunk (d flipped bits cannot touch all d+1 chunks), so the join
    * is keyed on (chunk index, chunk value) — no cross join, and
    * recall is exact by construction. Smaller chunks (higher maxDist)
    * collide more, trading candidate volume for distance. */
  def simhashNearDups(docs: DataFrame, maxDist: Int = 3,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val numChunks = maxDist + 1
    val chunkBits = (64 + numChunks - 1) / numChunks
    val sig = docs.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sig"))
    val chunked = sig.select(col("id"), col("sig"),
      posexplode(array((0 until numChunks).map { c =>
        val mask = if (chunkBits >= 64) -1L else (1L << chunkBits) - 1
        shiftright(col("sig"), c * chunkBits).bitwiseAND(mask)
      }: _*)).as(Seq("chunk", "cval")))

    val l = chunked.select(col("chunk"), col("cval"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("cval"),
      col("id").as("id_b"), col("sig").as("sig_b"))

    l.join(r, Seq("chunk", "cval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact n-gram (word-shingle) Jaccard similarity pairs within a
    * blocking column, via token-explode + equi-join on the shingle —
    * the shuffle is keyed by (block, shingle), never by document pair,
    * so skew is bounded by shingle frequency (salt hot shingles at
    * extreme scale). Returns (id_a, id_b, jaccard ≥ threshold). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double, n: Int = 3,
                        blockCol: String = "lang",
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
        graft.functions.GraftFunctions
          .ngram_explode(TextAnalysis.tokens(col(textCol)), n).as(Seq("shingle")))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))

    val l = sh.select(col("blk"), col("shingle"), col("id").as("id_a"))
    val r = sh.select(col("blk"), col("shingle"), col("id").as("id_b"))
    val inter = l.join(r, Seq("blk", "shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))

    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard", graft.ops.Ops.roundDet(col("n_common").cast("double") /
        (col("n_a") + col("n_b") - col("n_common")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  // ------------------------------------------- exact substring spans

  /** Cross-document repeated SPAN detection — the exact-substring
    * dedup signal ("Deduplicating Training Data Makes Language Models
    * Better", Lee et al. 2022): long verbatim passages shared between
    * documents, which set-based Jaccard ([[ngramJaccardPairs]]) cannot
    * see (a 50-token quote inside two otherwise-unrelated 1000-token
    * docs is ~5% Jaccard but 100% memorization risk).
    *
    * A shared run of s consecutive tokens appears as s-n+1 positional
    * n-gram matches on one DIAGONAL (pos_a - pos_b constant — the
    * dot-plot diagonal of sequence alignment), so spans fall out of a
    * gaps-and-islands pass over the match positions:
    *
    *  1. positional n-grams per doc (one narrow projection — tokens
    *     materialized first, the HOF discipline);
    *  2. equi-join on (block, gram) — the shuffle is keyed by the
    *     n-gram, never by document pair, exactly like
    *     [[ngramJaccardPairs]]; `maxDf` drops grams appearing in more
    *     than that many documents (boilerplate n-grams — a gram shared
    *     by hundreds of docs identifies no PAIR; the cap is the skew
    *     dial, same contract as minhashNearDups' maxBucket. Precision
    *     caveat: an over-df gram at a span's EDGE only trims it, but
    *     one in the span's MIDDLE splits the diagonal island in two —
    *     and if both fragments fall below minSpan the span is missed
    *     entirely, so maxDf trades recall on boilerplate-straddling
    *     spans, not just span length);
    *  3. per (pair, diagonal): row_number gaps-and-islands keyed by
    *     (id_a, id_b, diag) — a bounded-width window, no global sort;
    *  4. keep islands of ≥ minSpan-n+1 matches (= spans of ≥ minSpan
    *     tokens), aggregate per pair.
    *
    * Returns (id_a, id_b, n_spans, max_span) with id_a < id_b,
    * max_span in tokens, ordered. A span the OTHER doc contains twice
    * counts once per diagonal — each verbatim occurrence is a span.
    * Output is pair-family (~N² under exact replication). */
  def duplicateSpans(docs: DataFrame, minSpan: Int = 10, n: Int = 5,
                     maxDf: Int = 128,
                     blockCol: String = "lang",
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    require(minSpan >= n, s"minSpan ($minSpan) must be >= n ($n): a " +
      "span shorter than one n-gram has no n-gram evidence")
    val grams = docs
      .select(col(idCol).as("id"), col(blockCol).as("blk"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= n)
      .select(col("id"), col("blk"),
        posexplode(transform(sequence(lit(0), size(col("__tk")) - n),
          i => concat_ws(" ",
            (1 to n).map(j => element_at(col("__tk"), i + j)): _*)))
          .as(Seq("pos", "gram")))
    // boilerplate grams: the df aggregate shares the join's
    // (blk, gram) key, so the anti-join co-partitions with it
    val hot = grams.groupBy("blk", "gram")
      .agg(count_distinct(col("id")).as("__df"))
      .filter(col("__df") > maxDf)
      .select("blk", "gram")
    val pruned = grams.join(hot, Seq("blk", "gram"), "left_anti")

    val m = pruned.select(col("blk"), col("gram"),
        col("id").as("id_a"), col("pos").as("pos_a"))
      .join(pruned.select(col("blk"), col("gram"),
        col("id").as("id_b"), col("pos").as("pos_b")), Seq("blk", "gram"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pos_a"),
        (col("pos_a") - col("pos_b")).as("diag"))
    val w = Window.partitionBy(col("id_a"), col("id_b"), col("diag"))
      .orderBy(col("pos_a"))
    m.withColumn("__island", col("pos_a") - row_number().over(w))
      .groupBy("id_a", "id_b", "diag", "__island")
      .agg((count(lit(1)) + (n - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minSpan)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_spans"), max(col("span_tokens")).as("max_span"))
      .orderBy("id_a", "id_b")
  }

  /** REMOVE cross-document duplicated spans from every document —
    * the rewrite [[duplicateSpans]] only reports: the exact-substring
    * deduplication step of LLM corpus curation (cut the verbatim
    * boilerplate/quotation mass; reference: "Deduplicating Training
    * Data Makes Language Models Better", Lee et al. 2021 — their
    * suffix-array dedup, re-expressed as the positional-n-gram
    * diagonal-island chain that Spark can run keyed, never all-pairs).
    *
    * Pipeline = [[duplicateSpans]]'s chain through the diagonal
    * islands, then three more keyed/bounded steps:
    *
    *  5. each qualifying island becomes a token INTERVAL on BOTH
    *     documents of its pair (the b-side start is the a-start
    *     shifted by the diagonal);
    *  6. intervals merge per document (gaps-and-islands again — a
    *     doc-keyed window over its own intervals, bounded by the
    *     doc's span count);
    *  7. the merged interval list joins back doc-keyed and a codegen
    *     HOF drops covered token positions; survivors reassemble in
    *     order.
    *
    * Removal is SYMMETRIC (the span leaves every document carrying
    * it) — the conservative curation posture, mirroring
    * [[TextAnalysis.scrubBoilerplateLines]]' line-level policy;
    * keep-one-canonical-copy is the document-granularity survivor
    * path ([[CorpusPipeline]]'s e15). Intra-document repetition is
    * t11's axis, not this one: only cross-document spans scrub.
    *
    * Returns ALL documents — (doc_id, clean_text, n_scrubbed),
    * ordered; untouched docs pass through with n_scrubbed = 0 (their
    * text normalized through the same tokenize/rejoin as t8's
    * scrubber, so output text is whitespace-canonical in both
    * engines). The pair chain inside is pair-family (~N² under exact
    * replication) even though the OUTPUT is corpus-sized. */
  def scrubDuplicateSpans(docs: DataFrame, minSpan: Int = 10, n: Int = 5,
                          maxDf: Int = 128,
                          blockCol: String = "lang",
                          textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    require(minSpan >= n, s"minSpan ($minSpan) must be >= n ($n): a " +
      "span shorter than one n-gram has no n-gram evidence")
    val grams = docs
      .select(col(idCol).as("id"), col(blockCol).as("blk"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= n)
      .select(col("id"), col("blk"),
        posexplode(transform(sequence(lit(0), size(col("__tk")) - n),
          i => concat_ws(" ",
            (1 to n).map(j => element_at(col("__tk"), i + j)): _*)))
          .as(Seq("pos", "gram")))
    val hot = grams.groupBy("blk", "gram")
      .agg(count_distinct(col("id")).as("__df"))
      .filter(col("__df") > maxDf)
      .select("blk", "gram")
    val pruned = grams.join(hot, Seq("blk", "gram"), "left_anti")
    val m = pruned.select(col("blk"), col("gram"),
        col("id").as("id_a"), col("pos").as("pos_a"))
      .join(pruned.select(col("blk"), col("gram"),
        col("id").as("id_b"), col("pos").as("pos_b")), Seq("blk", "gram"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pos_a"),
        (col("pos_a") - col("pos_b")).as("diag"))
    val wIsl = Window.partitionBy(col("id_a"), col("id_b"), col("diag"))
      .orderBy(col("pos_a"))
    // 5. islands → (doc, token-interval) on both pair sides. m rows
    // are unique per (id_a, id_b, pos_a, diag) by construction (one
    // gram per (doc, pos); the diagonal pins pos_b), so row_number
    // island arithmetic is safe without a dedup pass
    val spans = m
      .withColumn("__island", col("pos_a") - row_number().over(wIsl))
      .groupBy("id_a", "id_b", "diag", "__island")
      .agg(min(col("pos_a")).as("p0"),
        (count(lit(1)) + (n - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minSpan)
    val iv = spans
      .select(col("id_a").as("id"), col("p0").as("s"),
        (col("p0") + col("span_tokens") - 1).as("e"))
      .unionByName(spans.select(col("id_b").as("id"),
        (col("p0") - col("diag")).as("s"),
        (col("p0") - col("diag") + col("span_tokens") - 1).as("e")))
    // 6. merge overlapping/adjacent-by-overlap intervals per doc
    val wOrd = Window.partitionBy(col("id")).orderBy(col("s"), col("e"))
    val pmax = max(col("e")).over(
      wOrd.rowsBetween(Window.unboundedPreceding, -1))
    val merged = iv
      .withColumn("__grp", sum(
          when(pmax.isNull || col("s") > pmax, 1L).otherwise(0L))
        .over(wOrd))
      .groupBy("id", "__grp")
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("s"), col("e"))))
        .as("__iv"))
    // 7. doc-keyed join back; HOF position filter; ordered reassembly
    docs.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .join(merged, Seq("id"), "left")
      .select(col("id"), col("__tk"), col("__iv"),
        transform(
          filter(
            transform(col("__tk"),
              (x, i) => struct(x.as("t"), i.as("p"))),
            kp => !exists(col("__iv"),
              v => kp("p") >= v("s") && kp("p") <= v("e"))),
          kp => kp("t")).as("__kept"))
      .select(col("id").as("doc_id"),
        when(col("__iv").isNull, concat_ws(" ", col("__tk")))
          .otherwise(concat_ws(" ", col("__kept"))).as("clean_text"),
        when(col("__iv").isNull, lit(0L))
          .otherwise((size(col("__tk")) - size(col("__kept")))
            .cast("long")).as("n_scrubbed"))
      .orderBy("doc_id")
  }

  // --------------------------------------------- components / canonical

  /** Connected components over a near-duplicate pair list — the step
    * that turns pairwise matches into dedup GROUPS so one canonical
    * document survives per group (pairs alone can't be acted on:
    * A~B and B~C must collapse to one cluster {A,B,C}).
    *
    * Distributed min-label propagation: every vertex starts labeled
    * with its own id and repeatedly takes the minimum label among
    * itself and its neighbors; converges in O(graph diameter)
    * rounds — near-dup clusters are shallow (diameter ≤ a few), so
    * 3-4 rounds in practice, `maxIters` as the safety bound. Each
    * round is one edge join + min-aggregate (shuffles keyed by vertex
    * id); lineage is truncated per round (localCheckpoint — mandatory
    * for iterative Spark, else the plan doubles every round). The
    * only driver-side values are the per-round convergence count and
    * loop bound — the labels themselves never leave the cluster.
    * Returns (id, comp) with comp = min id of the component. */
  def connectedComponents(pairs: DataFrame,
                          idA: String = "id_a", idB: String = "id_b",
                          maxIters: Int = 20): DataFrame = {
    // materialize the pair list once — the symmetric union consumes it
    // twice, and pair lists are typically the output of an expensive
    // similarity computation worth exactly one evaluation
    val p = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .localCheckpoint()
    val edges = p
      .union(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("dcomp")),
          "dst")
        .groupBy("src").agg(min(col("dcomp")).as("ncomp"))
      // carry the did-this-row-change flag through the same pass that
      // computes the new label: the convergence check then costs one
      // scan of the already-checkpointed round output, not an extra
      // join+shuffle per round (the former formulation re-joined
      // `updated` against `labels`). Still one blocking action per
      // round — O(diameter) of them, fine for shallow near-dup
      // clusters; a corpus with adversarial diameters would switch to
      // large-star/small-star, not tune this loop.
      val updated = labels
        .join(neighborMin.select(col("src").as("id"), col("ncomp")),
          Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (coalesce(col("ncomp"), col("comp")) < col("comp")).as("__changed"))
        .localCheckpoint()
      changed = updated.filter(col("__changed")).count()
      labels = updated.drop("__changed")
      i += 1
    }
    // silent non-convergence would hand back split components and let
    // duplicate groups keep multiple "canonical" survivors downstream
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters rounds " +
        s"($changed labels still changing) — raise maxIters " +
        "(component diameter exceeds the bound)")
    labels.orderBy("id")
  }

  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14) — the scale path when component diameters
    * are NOT shallow. [[connectedComponents]]' label propagation costs
    * O(diameter) rounds (each a blocking driver action); star
    * contraction converges in O(log n) rounds for ANY topology, so a
    * pathological chain of pairwise near-dups (common in boilerplate
    * chains: A~B~C~...~Z where A and Z share nothing) costs ~log
    * rounds instead of one round per link.
    *
    * Each round is two star operations, both expressed as
    * groupBy(min)-then-join — co-partitioned on the grouping key, so
    * the join after the aggregate does not reshuffle:
    *  - large-star: every node u points its LARGER neighbors at
    *    m(u) = min(u ∪ neighbors)
    *  - small-star: every node u points its smaller-or-equal
    *    neighbors (and itself) at the min of that set
    * The fixed point is a union of stars centered at each component's
    * minimum id. Convergence is detected by an order-independent edge
    * fingerprint (count + sum of xxhash64(lo,hi)) — one single-row
    * aggregate per round, never a diff join. Returns (id, comp) with
    * comp = min id of the component, bit-identical to
    * [[connectedComponents]] (ComponentsSpec pins both equalities). */
  def connectedComponentsStar(pairs: DataFrame,
                              idA: String = "id_a", idB: String = "id_b",
                              maxIters: Int = 50): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
    def sym(df: DataFrame): DataFrame = df
      .select(col("lo").as("u"), col("hi").as("v"))
      .union(df.select(col("hi").as("u"), col("lo").as("v")))

    var edges = canon(pairs.select(col(idA).as("src"), col(idB).as("dst")))
      .localCheckpoint()
    // (n_edges, xor of edge hashes) — equal fingerprints ⇒ equal edge
    // sets: edges are distinct, so the xor-fold is a set digest (and,
    // unlike a sum, cannot overflow under ANSI arithmetic); a
    // same-size same-xor collision would need a crafted corpus
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(
        expr("bit_xor(xxhash64(lo, hi))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var fp = fingerprint(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // large-star: m(u) over ALL neighbors, rewire the larger ones
      val s1 = sym(edges)
      val m1 = s1.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      val large = canon(s1.join(m1, "u").filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst")))
      // small-star: m over the smaller-or-equal neighborhood ∪ {u}
      val s2 = sym(large).filter(col("v") < col("u"))
      val m2 = s2.groupBy("u").agg(min(col("v")).as("m"))
      val small = canon(
        s2.join(m2, "u").select(col("v").as("src"), col("m").as("dst"))
          .union(m2.select(col("u").as("src"), col("m").as("dst"))))
        .localCheckpoint()
      val nfp = fingerprint(small)
      converged = nfp == fp
      fp = nfp
      edges = small
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIters rounds")
    // at the fixed point every edge is (component-min, member): comp =
    // min neighbor for leaves, self for centers
    val s = sym(edges)
    s.groupBy(col("u").as("id"))
      .agg(least(min(col("v")), col("u")).as("comp"))
      .orderBy("id")
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-duplicate pairs within a blocking column
    * (label/cluster): brute force inside blocks only. For unblocked
    * corpora, run [[Similarity.ivfAssign]] first and block on the
    * centroid id.
    *
    * Join strategy is PINNED to sort-merge: both sides of the
    * blk-keyed self-join are the corpus itself, so broadcast is
    * never right at scale — yet AQE's size estimates on the narrow
    * projected sides sat close enough to the broadcast threshold to
    * flip broadcast↔SMJ between runs (VERDICT r10 #4), which both
    * destabilizes plan-digest regression adjudication and would OOM
    * the driver the first time the corpus side got picked at real
    * scale. The hint chooses the strategy that is correct at 100 TB
    * at every scale. */
  def embeddingNearDups(embs: DataFrame, threshold: Double,
                        blockCol: String = "label",
                        vecCol: String = "embedding",
                        idCol: String = "vec_id"): DataFrame = {
    val v = embs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      col(vecCol).cast("array<double>").as("vec"))
    val l = v.select(col("blk"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = v.select(col("blk"), col("id").as("id_b"), col("vec").as("vec_b"))
    l.hint("merge").join(r.hint("merge"), Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        graft.ops.Ops.roundDet(Similarity.cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .orderBy("id_a", "id_b")
  }

  /** Edit-distance fuzzy key matching (entity resolution over string
    * KEYS — names, codes, ids-with-typos — the complement of the
    * shingle/MinHash families, which need token mass and blur on
    * short strings where a single typo IS the signal).
    *
    * Blocking is the FastSS 1-deletion neighborhood: each string
    * emits itself plus every single-character deletion as candidate
    * keys, and any two strings within Levenshtein distance 1 MUST
    * share a key (substitution at i → both i-deletions agree;
    * insertion/deletion → the shorter string is itself the longer
    * one's deletion variant). So like the SimHash pigeonhole join,
    * recall is exact BY CONSTRUCTION — WHILE no variant bucket
    * exceeds `maxBucket`; precision comes from the final
    * `levenshtein` verification, which touches only candidate pairs.
    *
    * Scale posture: the only shuffle is keyed by variant string —
    * ≤ (len+1) keys per row, never a pair; degenerate variant
    * buckets (a hot key family collapsing to one variant) are capped
    * by `maxBucket` like the LSH bucket joins. The cap is a recall/
    * boundedness DIAL, not a free lunch: a capped bucket drops the
    * pairs only that variant would witness, so brute-force-oracle
    * agreement (d14) is exact only below the cap — the registered
    * query's data, including the 10× sweep replica (~100 rows in
    * the hottest variant), stays far under the 1024 default; a
    * corpus hot enough to cap should either raise the dial or
    * accept LSH-style bounded recall, the same trade the MinHash
    * family documents. Verification cost is
    * proportional to the candidate set.
    *
    * maxDist is fixed at 1 by the 1-deletion scheme (k-deletion
    * neighborhoods generalize, at (len choose k) keys per row —
    * out of scope until a use case needs it). */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxBucket: Int = 1024): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(strCol).as("s"))
    // variant 0 = the string itself; variant i = char i deleted
    val keyed = base.select(col("id"), col("s"),
        explode(transform(sequence(lit(0), length(col("s"))),
          i => when(i === 0, col("s")).otherwise(concat(
            col("s").substr(lit(1), i - 1),
            col("s").substr(i + 1, length(col("s"))))))).as("v"))
      .select(col("id"), col("s"), col("v"))
    val capped = keyed
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("v"))))
      .filter(col("__n") <= maxBucket).drop("__n")
    capped.select(col("v"), col("id").as("id_a"), col("s").as("s_a"))
      .join(capped.select(col("v"), col("id").as("id_b"),
        col("s").as("s_b")), Seq("v"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "s_a", "s_b").distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= 1)
      .orderBy("id_a", "id_b")
  }
}
