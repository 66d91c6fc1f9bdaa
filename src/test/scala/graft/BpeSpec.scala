package graft

import graft.ext.Bpe

/** BPE merge-trainer verification (iterative state evolution — not
  * SQL-oracleable, so the contract is pinned here instead):
  * hand-computed merges on a classic corpus, sequential overlap
  * semantics, determinism across runs. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("learns the hand-computed merges on the classic corpus") {
    // word counts: low×5, lower×2 — every word ends with </w>
    val docs = Seq((1L, ("low " * 5 + "lower " * 2).trim))
      .toDF("doc_id", "text")
    val merges = Bpe.train(spark, docs, numMerges = 4)
      .as[(Int, String, String, Long)].collect().toSeq
    // pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2,
    // (e,r)=2, (r,</w>)=2 -> tie (l,o)/(o,w) broken lexicographically
    assert(merges(0) === ((1, "l", "o", 7L)))
    // "lo" now a symbol: (lo,w)=7 wins
    assert(merges(1) === ((2, "lo", "w", 7L)))
    // "low" a symbol: (low,</w>)=5 wins
    assert(merges(2) === ((3, "low", "</w>", 5L)))
    // remaining: lower = [low,e,r,</w>]: (e,r)=2,(low,e)=2,(r,</w>)=2
    // -> lexicographic tie-break picks (e,r)
    assert(merges(3) === ((4, "e", "r", 2L)))
  }

  test("initialPairCounts matches the hand-computed round-1 table") {
    // the b1_bpe_pair_counts driver row's engine side, on the classic
    // corpus whose pair table is written out above
    val docs = Seq((1L, ("low " * 5 + "lower " * 2).trim))
      .toDF("doc_id", "text")
    val got = Bpe.initialPairCounts(docs)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("l", "o", 7L), ("o", "w", 7L), ("w", "</w>", 5L),
      ("w", "e", 2L), ("e", "r", 2L), ("r", "</w>", 2L)))
  }

  test("overlap merges apply left-to-right like reference BPE") {
    // "aaaa": pairs (a,a)x3 -> merge a+a; sequential application
    // yields [aa, aa, </w>], NOT [aa, a, a...] or a triple overlap
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val merges = Bpe.train(spark, docs, numMerges = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges(0) === ((1, "a", "a", 3L)))
    // after round 1 the word is [aa, aa, </w>] — the 3 overlapping
    // (a,a) pairs collapsed to TWO merged symbols, not three.
    // Round 2 ties (aa,aa)=1 with (aa,</w>)=1; '<' sorts before 'a',
    // so the deterministic lexicographic tie-break picks (aa,</w>)
    assert(merges(1) === ((2, "aa", "</w>", 1L)))
  }

  test("encode reproduces the training segmentation and round-trips") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, ("low " * 5 + "lower " * 2).trim))
      .toDF("doc_id", "text")
    val merges = Bpe.train(spark, docs, numMerges = 4)
      .orderBy("round").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val toks = docs.select(Bpe.encode(col("text"), merges).as("t"))
      .as[Seq[String]].collect().head
    // merges: l+o, lo+w, low+</w>, e+r =>
    //   "low"   -> [low</w>]            "lower" -> [low, er, </w>]
    assert(toks.take(5) === Seq.fill(5)("low</w>"))
    assert(toks.drop(5) === Seq("low", "er", "</w>", "low", "er", "</w>"))
    // round-trip: stripping the word markers recovers the text
    val joined = toks.mkString("").replace("</w>", " ").trim
    assert(joined === ("low " * 5 + "lower " * 2).trim)
    // leading/trailing whitespace must not emit spurious ["", "</w>"]
    val padded = Seq((1L, "  low \n")).toDF("doc_id", "text")
      .select(Bpe.encode(col("text"), merges).as("t"))
      .as[Seq[String]].collect().head
    assert(padded === Seq("low</w>"))
  }

  test("encodeStaged reproduces the Column-form encode exactly") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, ("low " * 5 + "lower " * 2).trim),
        (2L, "  low \n"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = Bpe.train(spark, docs, numMerges = 4)
      .orderBy("round").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val direct = docs.select($"doc_id",
        Bpe.encode(col("text"), merges).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    // chunk=2 forces two staged folds plus the barrier between them
    val staged = Bpe.encodeStaged(docs, "text", "t", merges, chunk = 2)
      .select($"doc_id", $"t").as[(Long, Seq[String])].collect().toMap
    assert(staged == direct, s"staged $staged != direct $direct")
  }

  test("batch=8 equals batch=1 when no in-round follow-on can form") {
    // single-char words: each word is [c, </w>], so a merge completes
    // the word outright — no pair is CREATED inside a round, which is
    // exactly the regime where batched and sequential BPE provably
    // agree. All candidates share </w>, so the non-interaction filter
    // admits one merge per round and the batched path must reproduce
    // the batch=1 table bit-for-bit, counts included.
    val docs = Seq((1L, ("x " * 9 + "p " * 7 + "m " * 5).trim))
      .toDF("doc_id", "text")
    val seq1 = Bpe.train(spark, docs, numMerges = 3, batch = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    val seq8 = Bpe.train(spark, docs, numMerges = 3, batch = 8)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(seq1 === seq8)
    assert(seq1.map(m => (m._2, m._3, m._4)) ===
      Seq(("x", "</w>", 9L), ("p", "</w>", 7L), ("m", "</w>", 5L)))
  }

  test("batching cuts aggregation rounds >=5x where merges are disjoint") {
    // many words over pairwise-disjoint alphabets: each round's
    // candidate list holds many non-interacting pairs, so batch=8
    // accepts ~8 merges per aggregation pass
    val words = Seq("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op",
      "qr", "st", "uv", "wx")
    val text = words.zipWithIndex
      .map { case (w, i) => (w + " ") * (20 - i) }.mkString.trim
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val batched = Bpe.trainWithStats(spark, docs, numMerges = 12, batch = 8)
    assert(batched.merges.count() === 12L)
    assert(batched.aggregationRounds * 5 <= 12,
      s"expected >=5x rounds cut, got ${batched.aggregationRounds} rounds " +
        "for 12 merges")
    // batched learn order is still deterministic across runs
    val again = Bpe.train(spark, docs, numMerges = 12, batch = 8)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(again === batched.merges
      .as[(Int, String, String, Long)].collect().toSeq)
  }

  test("deterministic across repeated runs and stops when exhausted") {
    val docs = graft.queries.Q.t(spark, sf001, "documents").limit(50)
    val a = Bpe.train(spark, docs, 3).collect().toSeq
    val b = Bpe.train(spark, docs, 3).collect().toSeq
    assert(a === b && a.size === 3)
    // single-char single word exhausts after merging with </w>
    val tiny = Seq((1L, "x")).toDF("doc_id", "text")
    val m = Bpe.train(spark, tiny, 10).collect()
    // [x,</w>] -> merge 1 (x,</w>); then one symbol, no pairs left
    assert(m.length === 1)
  }
}
