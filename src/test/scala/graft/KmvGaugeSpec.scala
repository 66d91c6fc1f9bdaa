package graft

import org.apache.spark.sql.functions._

import graft.ext.Sketches

/** The stored KMV gauge's ingest-facing contracts — the properties
  * the a25/st24 registry rows rely on, pinned at the bit level:
  * replay-idempotent folds (an at-least-once re-delivery must not
  * move the estimate), exact crash-heal (a torn rename-swap loses no
  * folded state), loud failure on a missing gauge (never a silent
  * zero), and the ingest-level bootstrap for pre-gauge stores. */
class KmvGaugeSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def hfSet(dir: String): Set[Long] =
    spark.read.parquet(dir).as[Long].collect().toSet

  test("kmv: re-folding the SAME batch is bit-identical state — the " +
      "distinct-hash set identity that makes at-least-once replay " +
      "safe without any extra ledger") {
    val dir = tmp("kmvrep") + "/gauge"
    val a = (0L until 300L).toDF("k")
    val b = (250L until 420L).toDF("k")
    Sketches.kmvWrite(Sketches.kmvState(a, col("k")), dir)
    Sketches.kmvFold(spark, dir, b, col("k"))
    val once = hfSet(dir)
    // the replay: same rows, twice more
    Sketches.kmvFold(spark, dir, b, col("k"))
    Sketches.kmvFold(spark, dir, b, col("k"))
    assert(hfSet(dir) == once,
      "re-folding a delivered batch must not move the stored state")
    // and the folded state equals the one-shot over the union
    assert(once == Sketches.kmvState(
      a.unionByName(b), col("k")).as[Long].collect().toSet,
      "fold ≠ one-shot bottom-k over the union")
  }

  test("kmv: a torn rename-swap heals EXACTLY — live absent with " +
      "__old present restores the old generation; a missing gauge " +
      "fails loudly, never reads as empty") {
    val root = tmp("kmvcr")
    val dir = s"$root/gauge"
    Sketches.kmvWrite(
      Sketches.kmvState((0L until 100L).toDF("k"), col("k")), dir)
    val before = hfSet(dir)
    // simulate the one crash window kmvWrite leaves: the live gauge
    // stepped aside, the stage never renamed in
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old")))
    // any read/fold heals first — the restore is exact
    assert(Sketches.kmvReport(spark, dir)
      .select("n_kept").as[Long].head() == 100L)
    assert(hfSet(dir) == before, "heal must restore the exact state")
    // a genuinely missing gauge is loud on both fold and report
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    intercept[IllegalArgumentException] {
      Sketches.kmvFold(spark, dir, (0L until 5L).toDF("k"), col("k"))
    }
    intercept[IllegalArgumentException] {
      Sketches.kmvReport(spark, dir)
    }
  }

  test("kmv gauge rides the dedup ingest: folded per accepted batch, " +
      "bit-stable under re-delivery, monotone under takedown, and " +
      "bootstrapped for a pre-gauge store") {
    import graft.streaming.StreamingDedupIngest
    import graft.streaming.StreamingDedupIngest.stage
    def txt(id: Long): String =
      (0 until 6).map(j => s"tok${id}x$j").mkString(" ")
    val root = tmp("kmving")
    val ingest = new StreamingDedupIngest(spark, s"$root/ix",
      s"$root/corpus", s"$root/quar")
    def gaugeVal(): Double =
      ingest.health().filter($"metric" === "accepted_ids_kmv_est")
        .select("value").as[Double].head()
    val seed = (0L until 60L).map(i => (i, txt(i))).toDF("doc_id", "text")
    ingest.seed(seed)
    assert(gaugeVal() == 60d, "seed must seed the gauge (exact < k)")
    // token-disjoint fresh docs can never near-dup — all accepted
    val drop = (60L until 90L).map(i => (i, txt(i)))
      .toDF("doc_id", "text")
    stage(drop, s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(gaugeVal() == 90d, "accepted batch must fold")
    val state = hfSet(s"$root/corpus_kmv")
    // re-delivery through a fresh checkpoint: gauge bit-stable
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt2")
    assert(hfSet(s"$root/corpus_kmv") == state,
      "re-delivered batch must leave the gauge bit-identical")
    // takedown: live mass drops, the ever-accepted gauge does not
    ingest.retract(Seq(3L, 61L).toDF("doc_id"))
    val h = ingest.health().as[(String, Double)].collect().toMap
    assert(h("accepted_ids_kmv_est") == 90d,
      "the gauge is monotone — a takedown must not subtract")
    assert(h("store_corpus_rows") == 88d, "live mass is the store row")
    // pre-gauge store (in-place upgrade): health bootstraps from the
    // live corpus instead of failing or reporting a silent zero
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/corpus_kmv"), true)
    assert(gaugeVal() == 88d,
      "pre-gauge store must bootstrap from the live corpus")
  }

  test("sample gauge rides the dedup ingest: folded per accepted " +
      "batch, bit-stable under re-delivery, PURGED by takedown " +
      "(live prefix), bootstrapped for a pre-gauge store") {
    import graft.streaming.StreamingDedupIngest
    import graft.streaming.StreamingDedupIngest.stage
    def txt(id: Long): String =
      (0 until 6).map(j => s"tok${id}x$j").mkString(" ")
    val root = tmp("smping")
    val ingest = new StreamingDedupIngest(spark, s"$root/ix",
      s"$root/corpus", s"$root/quar")
    def sampled(): Seq[(Long, String)] =
      ingest.sampledDocs().select("doc_id", "text")
        .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val seed = (0L until 60L).map(i => (i, txt(i))).toDF("doc_id", "text")
    ingest.seed(seed)
    assert(sampled().map(_._1) == (0L until 60L),
      "under k the sample IS the accepted corpus")
    assert(sampled().forall { case (id, t) => t == txt(id) },
      "the sample must carry the accepted payload")
    val drop = (60L until 90L).map(i => (i, txt(i)))
      .toDF("doc_id", "text")
    stage(drop, s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(sampled().map(_._1) == (0L until 90L),
      "accepted batch must fold into the sample")
    // re-delivery through a fresh checkpoint: bit-stable
    val state = sampled()
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt2")
    assert(sampled() == state,
      "re-delivered batch must leave the sample bit-identical")
    // takedown: the sampled CONTENT must go (unlike the monotone
    // hash-only KMV gauge) — and the health row tracks the live size
    ingest.retract(Seq(3L, 61L).toDF("doc_id"))
    assert(sampled().map(_._1) == (0L until 90L).filterNot(
      Set(3L, 61L)), "takedown must purge sampled rows")
    val h = ingest.health().as[(String, Double)].collect().toMap
    assert(h("sampled_docs_rows") == 88d,
      "health must report the LIVE sample size")
    assert(h("accepted_ids_kmv_est") == 90d,
      "the KMV gauge stays monotone beside the purged sample")
    // pre-gauge store (in-place upgrade): bootstraps from the live
    // corpus — the retracted rows are already purged from it
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/corpus_sample"),
      true)
    assert(sampled().map(_._1) == (0L until 90L).filterNot(
      Set(3L, 61L)),
      "pre-gauge store must bootstrap the sample from the live corpus")
  }

  test("sample gauge: fold/merge equal the one-shot bottom-k rows; " +
      "replay is bit-identical; removal leaves EXACTLY the live " +
      "prefix; the one-row-per-key guard and loud-missing hold") {
    def rowsOf(dir: String): Seq[(Long, String, Long)] =
      spark.read.parquet(dir).select("k", "payload", "hf")
        .as[(Long, String, Long)].collect().toSeq.sortBy(_._3)
    def pop(r: Range): org.apache.spark.sql.DataFrame =
      r.map(i => (i.toLong, s"doc$i")).toDF("k", "payload")
    val root = tmp("smpg")
    val dir = s"$root/gauge"
    // seed on one slice, fold another, merge a third shard state —
    // must equal the one-shot sample over the union, bit-identical
    Sketches.sampleWrite(Sketches.sampleState(pop(0 until 300), "k",
      k = 64), dir)
    Sketches.sampleFold(spark, dir, pop(300 until 600), "k", k = 64)
    Sketches.sampleWrite(Sketches.sampleMergedState(Seq(
        spark.read.parquet(dir),
        Sketches.sampleState(pop(600 until 900), "k", k = 64)),
      "k", k = 64), s"$root/merged")
    val oneShot = Sketches.sampleState(pop(0 until 900), "k", k = 64)
      .select("k", "payload", "hf")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._3)
    assert(rowsOf(s"$root/merged") == oneShot,
      "folded+merged sample ≠ one-shot bottom-k over the union")
    // replay: re-folding a delivered batch is bit-identical
    Sketches.sampleFold(spark, dir, pop(300 until 600), "k", k = 64)
    val folded = rowsOf(dir)
    Sketches.sampleFold(spark, dir, pop(300 until 600), "k", k = 64)
    assert(rowsOf(dir) == folded,
      "re-folding a delivered batch must not move the sample")
    // removal: survivors are exactly the one-shot prefix minus the
    // removed keys (the live-prefix argument) — and idempotent,
    // including keys never sampled
    val removedKeys = oneShot.map(_._1).filter(_ % 5 == 0)
    Sketches.sampleRemove(spark, s"$root/merged",
      (0 until 900).filter(_ % 5 == 0).map(_.toLong).toDF("k"), "k")
    val after = rowsOf(s"$root/merged")
    assert(after == oneShot.filterNot(r => removedKeys.contains(r._1)),
      "removal must leave exactly the live prefix")
    Sketches.sampleRemove(spark, s"$root/merged",
      (0 until 900).filter(_ % 5 == 0).map(_.toLong).toDF("k"), "k")
    assert(rowsOf(s"$root/merged") == after,
      "re-removing the same keys must be a no-op")
    // two rows sharing a key would make the sampled payload
    // nondeterministic: the guard refuses (and can be waived)
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "payload")
    intercept[IllegalArgumentException] {
      Sketches.sampleState(dup, "k", k = 4).collect()
    }
    assert(Sketches.sampleState(dup, "k", k = 4,
      checkKeys = false).count() == 2L)
    // a missing gauge is loud on fold, remove, and report
    intercept[IllegalArgumentException] {
      Sketches.sampleFold(spark, s"$root/nope",
        pop(0 until 3), "k", k = 4)
    }
    intercept[IllegalArgumentException] {
      Sketches.sampleRemove(spark, s"$root/nope",
        pop(0 until 3).select("k"), "k")
    }
    intercept[IllegalArgumentException] {
      Sketches.sampleReport(spark, s"$root/nope", "k")
    }
    // the state carries its cap (__k): folding or merging at a
    // LARGER k than a constituent's is refused loudly — the smaller
    // state's discarded tail is unrecoverable, so the result would
    // not be the bottom-k of the union (a silently-biased sample)
    intercept[IllegalArgumentException] {
      Sketches.sampleFold(spark, dir, pop(900 until 950), "k", k = 128)
    }
    intercept[IllegalArgumentException] {
      Sketches.sampleMergedState(Seq(spark.read.parquet(dir),
          Sketches.sampleState(pop(900 until 950), "k", k = 128)),
        "k", k = 128).collect()
    }
    // a SMALLER k is always exact (it shrinks every prefix
    // consistently): folding at k = 32 must not throw
    Sketches.sampleFold(spark, dir, pop(900 until 950), "k", k = 32)
    assert(spark.read.parquet(dir).count() == 32L,
      "a smaller-k fold must shrink the stored prefix to its k")
  }

  test("hist marked: the gauge-internal watermark gates replayed " +
      "batches atomically with the fold; add preserves the mark; " +
      "remove subtracts exactly and refuses never-folded rows") {
    val dir = tmp("hmk") + "/gauge"
    def bins(): Set[(Long, Long)] =
      spark.read.parquet(dir).select("bin", "n").as[(Long, Long)]
        .collect().toSet
    def oneShot(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Sketches.histState(df, col("v"), 8L)
        .as[(Long, Long)].collect().toSet
    val seed = (0L until 40L).toDF("v")
    Sketches.histWriteMarked(
      Sketches.histState(seed, col("v"), 8L), dir, -1L)
    assert(Sketches.histMark(spark, dir) == -1L)
    val batch = (40L until 64L).toDF("v")
    assert(Sketches.histFoldMarked(spark, dir, batch, col("v"), 0L, 8L),
      "a fresh batch above the mark must fold")
    assert(Sketches.histMark(spark, dir) == 0L,
      "the fold must commit its mark in the same swap")
    val once = bins()
    assert(once == oneShot(seed.unionByName(batch)),
      "marked fold ≠ one-shot histogram over the union")
    // the replay: the same batch id is refused, state bit-identical
    // (the additive algebra would double-count without the gate)
    assert(!Sketches.histFoldMarked(spark, dir, batch, col("v"), 0L, 8L))
    assert(bins() == once, "replayed batch must not double-count")
    // correction add: mass lands, the watermark does NOT advance
    Sketches.histAddMarked(spark, dir,
      (100L until 108L).toDF("v"), col("v"), 8L)
    assert(Sketches.histMark(spark, dir) == 0L,
      "a correction add must not advance the mark")
    // exact subtraction, mark preserved; emptied bins drop
    Sketches.histRemoveMarked(spark, dir,
      (100L until 108L).toDF("v"), col("v"), 8L)
    assert(bins() == once && Sketches.histMark(spark, dir) == 0L,
      "remove must invert add exactly and keep the mark")
    // never-folded rows drive bins negative: loud, gauge unmoved
    intercept[IllegalArgumentException] {
      Sketches.histRemoveMarked(spark, dir,
        (500L until 600L).toDF("v"), col("v"), 8L)
    }
    assert(bins() == once, "a refused removal must not move the gauge")
  }

  test("hist gauge rides the dedup ingest: folded per accepted batch " +
      "under the batch watermark, bit-stable under re-delivery, " +
      "SUBTRACTED exactly by takedown (idempotently on a re-run), " +
      "p50/p95 served in health, readmit correction-folded, " +
      "bootstrapped for a pre-gauge store") {
    import graft.streaming.StreamingDedupIngest
    import graft.streaming.StreamingDedupIngest.stage
    def txt(id: Long): String =
      (0 until 6).map(j => s"tok${id}x$j").mkString(" ")
    val root = tmp("hsting")
    val ingest = new StreamingDedupIngest(spark, s"$root/ix",
      s"$root/corpus", s"$root/quar")
    def gotBins(): Set[(Long, Long)] =
      ingest.doclenHist().as[(Long, Long)].collect().toSet
    def oneShot(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Sketches.histState(df, length(col("text")).cast("long"), 16L)
        .as[(Long, Long)].collect().toSet
    val seed = (0L until 60L).map(i => (i, txt(i)))
      .toDF("doc_id", "text")
    ingest.seed(seed)
    assert(gotBins() == oneShot(seed), "seed must seed the gauge")
    val drop = (60L until 90L).map(i => (i, txt(i)))
      .toDF("doc_id", "text")
    stage(drop, s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    val all = seed.unionByName(drop)
    assert(gotBins() == oneShot(all), "accepted batch must fold")
    // re-delivery through a fresh checkpoint: the watermark gate
    // absorbs the replayed batch (addition would double-count)
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt2")
    assert(gotBins() == oneShot(all),
      "re-delivered batch must not double-count (watermark gate)")
    // takedown subtracts EXACTLY; a second identical retract is a
    // vacuous no-op (the purged store yields no rows to snapshot)
    ingest.retract(Seq(3L, 61L).toDF("doc_id"))
    val live = all.filter(!col("doc_id").isin(3L, 61L))
      .localCheckpoint()
    assert(gotBins() == oneShot(live), "takedown must subtract bins")
    ingest.retract(Seq(3L, 61L).toDF("doc_id"))
    assert(gotBins() == oneShot(live), "re-retract must be a no-op")
    // health p50/p95 from the stored gauge ≡ one-shot quantiles
    val h = ingest.health().as[(String, Double)].collect().toMap
    val twin = s"$root/hist_twin"
    Sketches.histWrite(Sketches.histState(ingest.corpus(),
      length(col("text")).cast("long"), 16L), twin)
    val q = Sketches.histQuantile(spark, twin, Seq(0.5, 0.95))
      .as[(Double, Long)].collect().toMap
    assert(h("doclen_p50") == q(0.5).toDouble &&
      h("doclen_p95") == q(0.95).toDouble,
      "health p50/p95 must equal the one-shot quantiles")
    // pre-gauge store (in-place upgrade): bootstraps from the live
    // corpus — retracted rows are already purged from it
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/corpus_hist"), true)
    assert(gotBins() == oneShot(live),
      "pre-gauge store must bootstrap from the live corpus")
    // readmit correction-fold: a quarantined near-dup never folds;
    // the review override folds it in (keyed on the not-yet-indexed
    // split — see the ingest's documented crash window)
    val dupDoc = Seq((200L, txt(5))).toDF("doc_id", "text")
    stage(dupDoc, s"$root/staging2", "d2")
    ingest.ingestAvailable(s"$root/staging2", s"$root/ckpt3")
    assert(gotBins() == oneShot(live),
      "a quarantined doc must not fold")
    ingest.readmit(Seq(200L).toDF("doc_id"))
    assert(gotBins() == oneShot(live.unionByName(dupDoc)),
      "readmit must correction-fold the readmitted doc's length")
  }

  test("hist gauge: fold/merge equal the one-shot histogram; " +
      "removal subtracts EXACTLY and refuses never-folded rows; " +
      "quantiles are exact at bin resolution; loud-missing holds") {
    import graft.ext.Sketches
    def binsOf(dir: String): Map[Long, Long] =
      spark.read.parquet(dir).as[(Long, Long)].collect().toMap
    // a deterministic skewed population: value = i % 37
    def pop(r: Range) = r.map(i => (i.toLong, (i % 37).toLong))
      .toDF("k", "v")
    val root = tmp("hstg")
    val dir = s"$root/gauge"
    Sketches.histWrite(
      Sketches.histState(pop(0 until 300), col("v"), 4L), dir)
    Sketches.histFold(spark, dir, pop(300 until 600), col("v"), 4L)
    Sketches.histWrite(Sketches.histMergedState(Seq(
      spark.read.parquet(dir),
      Sketches.histState(pop(600 until 900), col("v"), 4L))),
      s"$root/merged")
    val oneShot = Sketches.histState(pop(0 until 900), col("v"), 4L)
      .as[(Long, Long)].collect().toMap
    assert(binsOf(s"$root/merged") == oneShot,
      "folded+merged bins ≠ one-shot histogram")
    // exact subtraction: remove a slice, bins equal the one-shot
    // over the survivors; emptied bins drop
    Sketches.histRemove(spark, s"$root/merged",
      pop(0 until 900).filter($"k" % 3 === 0), col("v"), 4L)
    assert(binsOf(s"$root/merged") ==
      Sketches.histState(pop(0 until 900).filter($"k" % 3 =!= 0),
        col("v"), 4L).as[(Long, Long)].collect().toMap,
      "removal must subtract exactly")
    // removing rows never folded (values whose bins the gauge never
    // saw) drives bins negative: loud, and the gauge is untouched
    val before = binsOf(s"$root/merged")
    val ex = intercept[IllegalArgumentException] {
      Sketches.histRemove(spark, s"$root/merged",
        pop(0 until 10).select($"k", ($"v" + 1000L).as("v")),
        col("v"), 4L)
    }
    assert(ex.getMessage.contains("never folded"))
    assert(binsOf(s"$root/merged") == before,
      "a refused removal must leave the gauge untouched")
    // quantiles: exact at bin resolution vs the brute-force rank
    // over the live population's bins
    val live = pop(0 until 900).filter($"k" % 3 =!= 0)
      .select((floor($"v".cast("double") / 4.0).cast("long") * 4)
        .as("bin")).as[Long].collect().sorted
    val got = Sketches.histQuantile(spark, s"$root/merged",
      Seq(0.0, 0.5, 0.95, 1.0)).as[(Double, Long)].collect().toMap
    def brute(q: Double): Long =
      live(math.max(math.ceil(q * live.length).toLong, 1L).toInt - 1)
    assert(got == Map(0.0 -> brute(0.0), 0.5 -> brute(0.5),
      0.95 -> brute(0.95), 1.0 -> brute(1.0)),
      s"stored quantiles ≠ brute-force rank: $got")
    // missing gauge: loud on fold, remove, report, quantile
    intercept[IllegalArgumentException] {
      Sketches.histFold(spark, s"$root/nope", pop(0 until 3), col("v"))
    }
    intercept[IllegalArgumentException] {
      Sketches.histRemove(spark, s"$root/nope", pop(0 until 3), col("v"))
    }
    intercept[IllegalArgumentException] {
      Sketches.histReport(spark, s"$root/nope")
    }
    intercept[IllegalArgumentException] {
      Sketches.histQuantile(spark, s"$root/nope", Seq(0.5))
    }
  }

  test("kmv gauge rides the keyword ingest (store posture): seeded, " +
      "folded per accepted batch, reported in health") {
    import graft.streaming.StreamingKeywordIngest
    import graft.streaming.StreamingDedupIngest.stage
    def txt(id: Long): String =
      (0 until 5).map(j => s"w${id}v$j").mkString(" ")
    val root = tmp("kmvkw")
    val ingest = new StreamingKeywordIngest(spark, s"$root/ix",
      storeDir = Some(s"$root/store"))
    ingest.seed((0L until 40L).map(i => (i, txt(i)))
      .toDF("doc_id", "text"))
    stage((40L until 55L).map(i => (i, txt(i))).toDF("doc_id", "text"),
      s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    val h = ingest.health().as[(String, Double)].collect().toMap
    assert(h("accepted_ids_kmv_est") == 55d,
      "keyword ingest must fold the gauge through seed + append")
    assert(h("store_rows") == 55d)
  }
}
