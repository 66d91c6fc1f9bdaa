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
