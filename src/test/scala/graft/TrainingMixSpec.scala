package graft

import org.apache.spark.sql.functions._

import graft.ext.{Curation, Decontaminate, Packing, Similarity}

/** Behavioral tests for the round-2 curation family (c1-c3, a18, x4):
  * decontamination set algebra, packing layout invariants, weighted
  * mix rate edges/monotonicity, skew-profile exactness, and the
  * quantization error bound the x4 report claims. */
class TrainingMixSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "alpha beta gamma delta epsilon"), // shares 3-grams with eval
    (1L, "one two three four five six"),    // disjoint
    (2L, "alpha beta gamma zeta"),          // shares exactly one 3-gram
    (3L, "short doc")                       // < 3 tokens: no shingles
  ).toDF("doc_id", "text")

  private def evalSet =
    Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")

  test("decontaminate flags exactly the shingle-sharing docs, with counts") {
    val fl = Decontaminate.flagged(corpus, evalSet)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 0 shares "alpha beta gamma" and "beta gamma delta"; doc 2
    // shares only "alpha beta gamma"
    assert(fl == Map(0L -> 2L, 2L -> 1L))
  }

  test("clean is the exact complement of flagged") {
    val cleanIds = Decontaminate.clean(corpus, evalSet)
      .select("doc_id").as[Long].collect().toSet
    assert(cleanIds == Set(1L, 3L))
  }

  test("packSequences lays out the cumsum layout, offsets inside budget") {
    // token counts: a=3, b=4, c=2, all one group. budget 5:
    // starts 0,3,7 → seqs 0,0,1; offsets 0,3,2
    val docs = Seq(
      (1L, "g", "t t t"), (2L, "g", "t t t t"), (3L, "g", "t t")
    ).toDF("doc_id", "lang", "text")
    val out = Packing.packSequences(docs, budget = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "seq_id", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 3L, 0L, 0L), (2L, 4L, 0L, 3L), (3L, 2L, 1L, 2L)))
  }

  test("packSequences invariants hold on the fixture corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val packed = Packing.packSequences(docs, budget = 128).cache()
    try {
      assert(packed.count() == docs.count())
      assert(packed.filter($"seq_offset" < 0 || $"seq_offset" >= 128).isEmpty)
      // each group's first doc opens sequence 0 at offset 0
      val firsts = packed.groupBy("lang")
        .agg(min(struct($"doc_id", $"seq_id", $"seq_offset")).as("f"))
        .select($"f.seq_id", $"f.seq_offset")
        .collect()
      assert(firsts.forall(r => r.getLong(0) == 0L && r.getLong(1) == 0L))
      // packStats tokens reconcile with the per-doc counts
      val stats = Packing.packStats(packed, budget = 128)
      val lhs = stats.agg(sum($"n_tokens")).head.getLong(0)
      val rhs = packed.agg(sum($"n_tokens")).head.getLong(0)
      assert(lhs == rhs)
    } finally packed.unpersist()
  }

  test("sharded packing preserves the doc set and the offset invariant") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val packed = Packing.packSequences(docs, budget = 128, shards = 4)
    assert(packed.select("doc_id").distinct().count() == docs.count())
    assert(packed.filter($"seq_offset" < 0 || $"seq_offset" >= 128).isEmpty)
  }

  test("sharded packing: (group, seq_id) identifies ONE physical sequence") {
    // regression: seq_id used to restart at 0 per shard, so 4 shards'
    // sequences collided on (lang, 0) and packStats read filled ~4.0
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val packed = Packing.packSequences(docs, budget = 128, shards = 4)
    val stats = Packing.packStats(packed, budget = 128)
    val maxFilled = stats.agg(max($"filled")).first().getDouble(0)
    // one straddling doc can push a real sequence past 1.0, but a
    // shard collision multiplies it toward ~shards
    assert(maxFilled < 2.0, s"shard-collided sequences: filled=$maxFilled")
    // shard interleaving: distinct seq ids ≈ total tokens / budget,
    // not that number divided by shards
    val nSeqs = stats.count()
    val totalTokens = packed.agg(sum($"n_tokens")).first().getLong(0)
    assert(nSeqs >= totalTokens / 128,
      s"too few sequences ($nSeqs) for $totalTokens tokens")
  }

  test("weightedMix: rate 1 keeps all, rate 0 keeps none, rates nest") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val n = docs.count()
    assert(Curation.weightedMix(docs, "source", Map.empty,
      defaultRate = 1.0).count() == n)
    assert(Curation.weightedMix(docs, "source", Map.empty,
      defaultRate = 0.0).count() == 0)
    // determinism + monotonicity: the 10% mix is a subset of the 50%
    val lo = Curation.weightedMix(docs, "source", Map.empty, defaultRate = 0.1)
      .select("doc_id")
    val hi = Curation.weightedMix(docs, "source", Map.empty, defaultRate = 0.5)
      .select("doc_id")
    assert(lo.join(hi, Seq("doc_id"), "left_anti").isEmpty)
    assert(lo.count() > 0 && lo.count() < hi.count())
  }

  test("skewProfile computes the exact per-key count summary") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val r = Curation.skewProfile(df, "k", heavyThreshold = 2L).head
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("max_n") == 6L)
    assert(r.getAs[Double]("avg_n") == 3.3333)
    assert(r.getAs[Long]("n_heavy") == 2L)
    assert(r.getAs[Double]("top_share") == 0.6)
  }

  test("quantize emits in-range codes and honors the error bound") {
    val embs = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = Similarity.quantize(embs)
    assert(q.filter(exists(col("codes"),
      c => c < 0 || c > 255)).isEmpty)
    // reported max_err <= (mx-mn)/510: half-up rounding is off by at
    // most half a quantization step. The report rounds at 6dp (up to
    // 5e-7 upward), so compare with a 1e-6 slack.
    val viol = Similarity.quantizeError(embs)
      .join(q.select($"vec_id", (($"mx" - $"mn") / 510.0).as("bound")),
        Seq("vec_id"))
      .filter($"max_err" > $"bound" + 1e-6)
    assert(viol.isEmpty)
  }

  test("constant vectors quantize to code 0 with zero error") {
    val df = Seq((0L, Array.fill(8)(0.25f))).toDF("vec_id", "embedding")
    val r = Similarity.quantizeError(df).head
    assert(r.getAs[Long]("code_min") == 0L)
    assert(r.getAs[Long]("code_max") == 0L)
    assert(r.getAs[Double]("max_err") == 0.0)
    assert(r.getAs[Double]("avg_err") == 0.0)
  }
}
