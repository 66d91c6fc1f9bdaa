package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{KeywordIndex, Relevance, StoredIndex}

/** The stored keyword (inverted) index family: every lifecycle path
  * pinned bit-exact against [[Relevance.bm25TopDocs]] over the live
  * corpus — the in-query scorer IS the family's oracle (and t7's
  * DuckDB SQL is ITS oracle, so the chain grounds out cross-engine).
  * Mirrors the d15/x9 spec discipline: build/probe identity, append
  * ≡ one-shot, retract moves the STATISTICS not just the page,
  * compact/bloom hygiene, shard merge/absorb guards, crash-window
  * behavior, and a randomized interleaving sweep. */
class KeywordIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta",
    "epsilon", "zeta", "eta", "theta", "iota", "kappa")
  private val rnd = new scala.util.Random(23)
  private def doc(): String =
    Seq.fill(6 + rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")
  // one common, one mid, one ABSENT term: the absent term drives the
  // df = 0 / all-zero-tf legs in both the stored and in-query paths
  private val terms = Seq("alpha", "theta", "nosuchterm")

  private def corpusOf(n: Int, from: Long = 0L): DataFrame =
    (from until from + n).map(i => (i, doc())).toDF("doc_id", "text")
      .localCheckpoint()

  private def page(df: DataFrame): Seq[(Int, Long, Double)] =
    df.as[(Int, Long, Double)].collect().toSeq

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def assertServes(dir: String, live: DataFrame, topN: Int = 8,
                           what: String = ""): Unit = {
    // zeroFill = true: bm25TopDocs ranks the WHOLE live corpus, so
    // the stored page must opt into the zero-score tail to match a
    // short page bit-for-bit (the oracle posture; the default
    // production page is candidates-only — tested separately)
    val stored = page(KeywordIndex.probe(spark, dir, terms, topN,
      zeroFill = true))
    val direct = page(Relevance.bm25TopDocs(live, terms, topN))
    assert(stored == direct, s"$what: stored page != in-query scorer")
  }

  test("k: build + probe ≡ in-query BM25, including the zero-fill " +
      "tail of a short page") {
    val corpus = corpusOf(24)
    val dir = tmp("kwix")
    KeywordIndex.build(corpus, dir)
    assertServes(dir, corpus, topN = 8, what = "fresh build")
    // page larger than the candidate set: every document contains a
    // vocab word, but a query of ONLY the absent term leaves zero
    // candidates — the page must fill with smallest-id zero-score
    // docs exactly as the in-query ranking does
    val onlyAbsent = Seq("nosuchterm")
    val stored = page(KeywordIndex.probe(spark, dir, onlyAbsent, 5,
      zeroFill = true))
    val direct = page(Relevance.bm25TopDocs(corpus, onlyAbsent, 5))
    assert(stored == direct, "all-zero page must match (id-ordered)")
    assert(stored.map(_._3).forall(_ == 0.0))
    // the DEFAULT (production) page is candidates-only: no query
    // term matches anything, so the honest answer is an empty page —
    // and no doclens read ever happens (PlanSpec gates the plan)
    assert(page(KeywordIndex.probe(spark, dir, onlyAbsent, 5)).isEmpty,
      "default page must be candidates-only (short, not zero-filled)")
    // and freshness: a content ensure over the same corpus is a no-op
    assert(!KeywordIndex.ensure(corpus, dir), "must stay fresh")
    assert(KeywordIndex.ensure(corpus.filter($"doc_id" < 12L), dir),
      "stale index must rebuild")
  }

  test("k: append chain ≡ one-shot build; id guard; empty-batch " +
      "guard; probe rejects non-distinct terms") {
    val a = corpusOf(16)
    val b = corpusOf(8, from = 16L)
    val union = a.unionByName(b).localCheckpoint()
    val oneShot = tmp("kwos")
    KeywordIndex.build(union, oneShot)
    val chained = tmp("kwch")
    KeywordIndex.build(a, chained)
    KeywordIndex.append(b, chained)
    assertServes(chained, union, what = "append chain")
    assert(page(KeywordIndex.probe(spark, chained, terms, 8)) ==
      page(KeywordIndex.probe(spark, oneShot, terms, 8)),
      "append chain must serve the one-shot page")
    // the default page is the candidates-only PREFIX of the
    // zero-filled ranking: same rows wherever scores are positive
    val full = page(KeywordIndex.probe(spark, chained, terms, 8,
      zeroFill = true))
    val short = page(KeywordIndex.probe(spark, chained, terms, 8))
    assert(short == full.take(short.size) &&
      short.forall(_._3 > 0.0) &&
      full.drop(short.size).forall(_._3 == 0.0),
      "default page must be the positive-score prefix of the " +
        "zero-filled ranking")
    assert(!KeywordIndex.ensure(union, chained),
      "XOR meta merge must stay content-fresh")
    intercept[IllegalArgumentException] {
      KeywordIndex.append(b, chained) // re-used ids
    }
    intercept[IllegalArgumentException] {
      KeywordIndex.append(b.filter($"doc_id" < 0L), chained) // empty
    }
    intercept[IllegalArgumentException] {
      KeywordIndex.probe(spark, chained, Seq("alpha", "alpha"), 5)
    }
  }

  test("k: retraction moves the corpus STATISTICS, not just the " +
      "page; compact materializes, re-mints the bloom, and allows " +
      "re-append") {
    val corpus = corpusOf(20)
    val live = corpus.filter($"doc_id" % 4 =!= 1L).localCheckpoint()
    val gone = corpus.filter($"doc_id" % 4 === 1L).localCheckpoint()
    val dir = tmp("kwrt")
    KeywordIndex.build(corpus, dir)
    KeywordIndex.remove(gone, dir)
    // the tombstoned serve must equal a fresh build over the live
    // set — BM25's df/N/Σdl all shift, so a page-only filter fails
    assertServes(dir, live, what = "tombstoned serve")
    assert(!KeywordIndex.ensure(live, dir),
      "XOR un-mix must leave the live-content fingerprint")
    // double-retraction of the same ids must be refused
    intercept[IllegalArgumentException] {
      KeywordIndex.remove(gone, dir)
    }
    // compact: same page, deletes dropped, bloom re-minted
    KeywordIndex.compact(spark, dir)
    assertServes(dir, live, what = "compacted serve")
    assert(StoredIndex.readDeleteIds(spark, dir).isEmpty,
      "compact must drop the materialized tombstones")
    val bloom = StoredIndex.readIdBloom(spark, dir)
    assert(bloom.isDefined, "compact must keep the bloom armed")
    val goneIds = gone.select($"doc_id").as[Long].collect()
    val hits = live.sparkSession.range(0, 20)
      .select(col("id"),
        StoredIndex.mightContain(bloom.get, col("id")).as("h"))
      .as[(Long, Boolean)].collect().toMap
    assert(goneIds.forall(id => !hits(id)),
      "purged ids must be bloom-negative after the compact re-mint")
    // and the purged ids are re-appendable into the compacted index
    KeywordIndex.append(gone, dir)
    assertServes(dir, corpus, what = "re-append after compact")
  }

  test("k: shard merge / absorb ≡ union build; disjointness and " +
      "committed-meta guards hold") {
    val a = corpusOf(12)
    val b = corpusOf(12, from = 12L)
    val union = a.unionByName(b).localCheckpoint()
    val dirA = tmp("kwsa"); val dirB = tmp("kwsb"); val dirM = tmp("kwsm")
    KeywordIndex.build(a, dirA)
    KeywordIndex.build(b, dirB)
    KeywordIndex.merge(spark, Seq(dirA, dirB), dirM)
    assertServes(dirM, union, what = "merged shards")
    assert(!KeywordIndex.ensure(union, dirM),
      "folded meta must equal the one-shot fingerprint")
    intercept[IllegalArgumentException] { // shared ids
      KeywordIndex.merge(spark, Seq(dirA, dirA), tmp("kwsx"))
    }
    intercept[IllegalArgumentException] { // outDir is a shard
      KeywordIndex.merge(spark, Seq(dirA, dirB), dirA)
    }
    // absorb in place: A absorbs B, serves the union
    KeywordIndex.absorb(spark, dirB, dirA)
    assertServes(dirA, union, what = "absorbed shard")
    intercept[IllegalStateException] { // meta-less target
      KeywordIndex.absorb(spark, dirB, tmp("kwse"))
    }
  }

  test("k: staged rebuild swaps under a serving index and clears " +
      "stale tombstones") {
    val corpus = corpusOf(18)
    val dir = tmp("kwsg")
    KeywordIndex.build(corpus, dir)
    KeywordIndex.remove(corpus.filter($"doc_id" < 3L), dir)
    val live = corpus.filter($"doc_id" >= 3L).localCheckpoint()
    // retrain over the survivors: the staged build must land its OWN
    // clean generation (no deletes asset carried over) and serve it
    KeywordIndex.rebuildStaged(live, dir)
    assert(StoredIndex.readDeleteIds(spark, dir).isEmpty,
      "swap must not carry the old generation's tombstones")
    assertServes(dir, live, what = "staged rebuild")
    // ids retracted in the OLD generation are live-new in this one
    KeywordIndex.append(corpus.filter($"doc_id" < 3L), dir)
    assertServes(dir, corpus, what = "append after staged rebuild")
  }

  test("k: health stored ≡ derived on fresh build; tombstone state " +
      "gauges move and settle at compact") {
    val corpus = corpusOf(15)
    val dir = tmp("kwhl")
    KeywordIndex.build(corpus, dir)
    val stored = KeywordIndex.health(spark, dir)
    val derived = KeywordIndex.healthFromCorpus(corpus)
    assert(stored.exceptAll(derived).unionByName(
      derived.exceptAll(stored)).isEmpty,
      "fresh-build health must equal the corpus-derived frame")
    def gauge(name: String): Double =
      KeywordIndex.health(spark, dir)
        .filter($"metric" === name).head.getDouble(1)
    val liveBefore = gauge("n_docs_live")
    KeywordIndex.remove(corpus.filter($"doc_id" < 4L), dir)
    assert(gauge("n_tombstoned") == 4d)
    assert(gauge("n_docs_live") == liveBefore - 4d)
    KeywordIndex.compact(spark, dir)
    assert(gauge("n_tombstoned") == 0d)
    assert(gauge("n_docs_live") == liveBefore - 4d)
  }

  test("k: a crash inside the commit window leaves a validation-" +
      "failing index that ensure() rebuilds") {
    val corpus = corpusOf(10)
    val dir = tmp("kwcr")
    KeywordIndex.build(corpus, dir)
    // simulate a crash mid-mutation: the commit marker is deleted
    // first by every mutation, so the on-disk state after a crash is
    // exactly "assets present, meta absent"
    StoredIndex.invalidate(spark, dir)
    assert(KeywordIndex.ensure(corpus, dir),
      "meta-less index must rebuild, not serve")
    assertServes(dir, corpus, what = "post-crash rebuild")
  }

  test("k: filtered serve ≡ in-query BM25 over the allowed subset " +
      "(scoped-corpus statistics)") {
    val corpus = corpusOf(30)
    val dir = tmp("kwfl")
    KeywordIndex.build(corpus, dir)
    val allowed = corpus.filter($"doc_id" % 3 === 0L)
    val stored = page(KeywordIndex.probeTopKFiltered(spark, dir, terms,
      topN = 6, allowed = allowed.select("doc_id"), zeroFill = true))
    val direct = page(Relevance.bm25TopDocs(allowed, terms, 6))
    assert(stored == direct,
      "filtered page must equal a dedicated subset-corpus index")
    // global-stats posture: candidates restricted to allowed, scores
    // = the UNFILTERED ranking's (derive the expectation from the
    // in-query scorer's full page, filtered to allowed, re-ranked)
    def globalExpect(live: DataFrame, allowedIds: Set[Long],
                     topN: Int): Seq[(Int, Long, Double)] =
      page(Relevance.bm25TopDocs(live, terms,
          live.count().toInt))
        .filter(r => allowedIds(r._2) && r._3 > 0.0)
        .sortBy(r => (-r._3, r._2)).take(topN).zipWithIndex
        .map { case ((_, id, sc), i) => (i + 1, id, sc) }
    val allowedIds = allowed.select("doc_id").as[Long].collect().toSet
    val storedG = page(KeywordIndex.probeTopKFiltered(spark, dir, terms,
      topN = 6, allowed = allowed.select("doc_id"),
      scopedStats = false))
    assert(storedG == globalExpect(corpus, allowedIds, 6),
      "global-stats filtered page must be the unfiltered ranking " +
        "restricted to the allowed candidates")
    // and under pending tombstones: the live∩allowed corpus
    KeywordIndex.remove(corpus.filter($"doc_id" % 5 === 0L), dir)
    val liveAllowed = allowed.filter($"doc_id" % 5 =!= 0L)
    val stored2 = page(KeywordIndex.probeTopKFiltered(spark, dir, terms,
      topN = 6, allowed = allowed.select("doc_id"), zeroFill = true))
    assert(stored2 == page(Relevance.bm25TopDocs(liveAllowed, terms, 6)),
      "filtered page must track the live∩allowed set")
    // the over-cap fallback (broadcast semi-join instead of the
    // literal id IN pushdown) must serve the IDENTICAL page — the
    // cap is a plan choice, never a semantics choice. cap = 0 takes
    // the bare semi-join; cap = 1 forces the overflow WITH the
    // [min, max] hull pre-filter pushed beneath the join
    for (cap <- Seq(0, 1)) {
      val fallback = page(KeywordIndex.probeTopKFiltered(spark, dir,
        terms, topN = 6, allowed = allowed.select("doc_id"),
        zeroFill = true, pushdownCap = cap))
      assert(fallback == stored2,
        s"cap=$cap fallback must serve the same page as the pushdown")
    }
    val live = corpus.filter($"doc_id" % 5 =!= 0L).localCheckpoint()
    val storedG2 = page(KeywordIndex.probeTopKFiltered(spark, dir, terms,
      topN = 6, allowed = allowed.select("doc_id"),
      scopedStats = false))
    assert(storedG2 == globalExpect(live,
      allowedIds -- corpus.filter($"doc_id" % 5 === 0L)
        .select("doc_id").as[Long].collect(), 6),
      "tombstoned global-stats filtered page must track the live set")
  }

  test("k: threshold serve = exactly the docs clearing the bar, " +
      "doc_id-ordered, no rank window; bar must be positive") {
    val corpus = corpusOf(30)
    val dir = tmp("kwrg")
    KeywordIndex.build(corpus, dir)
    // full ranking from the in-query scorer, then cut at the bar —
    // the expected range answer
    val bar = 0.8
    val expected = page(Relevance.bm25TopDocs(corpus, terms, 30))
      .filter(_._3 >= bar).map(r => (r._2, r._3)).sortBy(_._1)
    val got = KeywordIndex.probeRange(spark, dir, terms, minScore = bar)
      .as[(Long, Double)].collect().toSeq
    assert(got == expected, "range serve must cut the full ranking " +
      s"at the bar (got ${got.size}, expected ${expected.size})")
    assert(expected.nonEmpty, "vacuous bar — lower it")
    intercept[IllegalArgumentException] {
      KeywordIndex.probeRange(spark, dir, terms, minScore = 0.0)
    }
  }

  test("k: wide queries route to the ordered-HOF fold scorer — " +
      "40- and 64-term pages are exact, the plan stays one bounded " +
      "aggregate, and narrow queries keep the pivot") {
    val corpus = corpusOf(25)
    val dir = tmp("kwwd")
    KeywordIndex.build(corpus, dir)
    // every vocab word + absent terms past the 32-term routing
    // threshold: the fold plan is one bounded aggregate where the
    // pivot would mint one conditional-sum pair per term — and the
    // page is bit-exact against the in-query fixed-order tree
    // (absent terms' exact-0.0 contributions skip in order)
    for (n <- Seq(30, 54)) {
      val wide = vocab ++ (1 to n).map(i => s"absent$i")
      val stored = page(KeywordIndex.probe(spark, dir, wide, 10,
        zeroFill = true))
      val direct = page(Relevance.bm25TopDocs(corpus, wide, 10))
      assert(stored == direct, s"${vocab.size + n}-term page must match")
    }
    val wide = vocab ++ (1 to 54).map(i => s"absent$i")
    val widePlan = KeywordIndex.probe(spark, dir, wide, 10)
      .queryExecution.executedPlan.toString
    assert(widePlan.contains("collect_list"),
      "64-term probe must route through the held-terms fold")
    val narrowPlan = KeywordIndex.probe(spark, dir, terms, 10)
      .queryExecution.executedPlan.toString
    assert(!narrowPlan.contains("collect_list"),
      "narrow probe must keep the fixed-term-order pivot")
    // the routing covers every scoredCandidates caller: the wide
    // filtered (both stats postures) and range serves stay exact
    val allowed = corpus.filter($"doc_id" % 2 === 0L)
    assert(page(KeywordIndex.probeTopKFiltered(spark, dir, wide, 8,
      allowed = allowed.select("doc_id"), zeroFill = true)) ==
      page(Relevance.bm25TopDocs(allowed, wide, 8)),
      "wide scoped filtered page must match")
    val wideRange = KeywordIndex.probeRange(spark, dir, wide, 0.1)
      .as[(Long, Double)].collect().toSeq
    val directRange = page(Relevance.bm25TopDocs(corpus, wide,
        corpus.count().toInt))
      .filter(_._3 >= 0.1).map(r => (r._2, r._3)).sortBy(_._1)
    assert(wideRange == directRange, "wide range serve must match")
  }

  test("k: probeMany ≡ the per-qid single probes, including an " +
      "all-absent query's empty page; qid/term guards hold") {
    val corpus = corpusOf(26)
    val dir = tmp("kwpm")
    KeywordIndex.build(corpus, dir)
    val qs: Seq[(Long, Seq[String])] = Seq(
      0L -> Seq("alpha", "theta", "nosuchterm"),
      1L -> Seq("beta"),
      2L -> Seq("nosuchterm"))
    val many = KeywordIndex.probeMany(spark, dir, qs, topN = 6)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val singles = qs.flatMap { case (q, ts) =>
      KeywordIndex.probe(spark, dir, ts, 6)
        .as[(Int, Long, Double)].collect().toSeq
        .map(r => (q, r._1, r._2, r._3))
    }
    assert(many == singles,
      "batched pages must equal the single-probe pages per qid")
    // and under pending tombstones (stats/df/candidates all shift)
    KeywordIndex.remove(corpus.filter($"doc_id" % 3 === 1L), dir)
    val many2 = KeywordIndex.probeMany(spark, dir, qs, topN = 6)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val singles2 = qs.flatMap { case (q, ts) =>
      KeywordIndex.probe(spark, dir, ts, 6)
        .as[(Int, Long, Double)].collect().toSeq
        .map(r => (q, r._1, r._2, r._3))
    }
    assert(many2 == singles2, "tombstoned batched pages must match")
    intercept[IllegalArgumentException] { // duplicate qid
      KeywordIndex.probeMany(spark, dir,
        Seq(0L -> Seq("alpha"), 0L -> Seq("beta")), 3)
    }
    intercept[IllegalArgumentException] { // empty terms
      KeywordIndex.probeMany(spark, dir, Seq(0L -> Seq.empty), 3)
    }
    intercept[IllegalArgumentException] { // repeated term
      KeywordIndex.probeMany(spark, dir,
        Seq(0L -> Seq("alpha", "alpha")), 3)
    }
  }

  test("k: merge/absorb refuse a nested outDir (path-prefix " +
      "overlap would destroy shard assets)") {
    val a = corpusOf(8)
    val dirA = tmp("kwov")
    KeywordIndex.build(a, dirA)
    intercept[IllegalArgumentException] { // outDir inside a shard
      KeywordIndex.merge(spark, Seq(dirA), s"$dirA/nested")
    }
    intercept[IllegalArgumentException] { // shard inside outDir
      val out = tmp("kwov2")
      KeywordIndex.build(corpusOf(4, from = 100L), s"$out/sh")
      KeywordIndex.merge(spark, Seq(s"$out/sh"), out)
    }
    intercept[IllegalArgumentException] { // absorb: shard nested
      KeywordIndex.absorb(spark, s"$dirA/nested", dirA)
    }
  }

  test("k: healthFromCorpus reports bloom_present = 0 on an empty " +
      "corpus, matching build's null-bloom write") {
    val empty = corpusOf(0)
    val dir = tmp("kwem")
    KeywordIndex.build(empty, dir)
    assert(StoredIndex.readIdBloom(spark, dir).isEmpty,
      "empty-corpus build writes a null bloom")
    val stored = KeywordIndex.health(spark, dir)
    val derived = KeywordIndex.healthFromCorpus(empty)
    assert(stored.exceptAll(derived).unionByName(
      derived.exceptAll(stored)).isEmpty,
      "empty-corpus health must agree stored ≡ derived")
  }

  test("k: probeManyFiltered ≡ per-qid filtered probes (global " +
      "stats); an empty-allowed qid serves an empty page; " +
      "probeManyRange ≡ per-qid range probes") {
    val corpus = corpusOf(30)
    val dir = tmp("kwmf")
    KeywordIndex.build(corpus, dir)
    val queries = Seq(0L -> terms, 1L -> Seq("beta", "kappa"),
      2L -> Seq("gamma"))
    // per-qid allowed sets: qid 0 → ids % 3 = 0, qid 1 → ids % 3 = 1,
    // qid 2 → NONE (its page must be empty, not global)
    val pairs = corpus.select($"doc_id").as[Long].collect().toSeq
      .flatMap(id => Seq((0L, id), (1L, id)).filter {
        case (q, i) => i % 3 == q })
      .toDF("qid", "doc_id")
    val batched = KeywordIndex.probeManyFiltered(spark, dir, queries,
      topN = 5, allowed = pairs)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val single = queries.flatMap { case (q, ts) =>
      page(KeywordIndex.probeTopKFiltered(spark, dir, ts, 5,
        allowed = corpus.filter($"doc_id" % 3 === q)
          .select("doc_id"),
        scopedStats = false))
        .map { case (r, id, sc) => (q, r, id, sc) }
    }.filter(_._1 != 2L)
    assert(batched == single,
      "batched filtered pages must equal the per-qid filtered probes")
    assert(!batched.exists(_._1 == 2L),
      "a qid with no allowed rows must serve an empty page")
    // threshold: per-qid equality against the single-range serve
    val bar = 0.3
    val rangeBatched = KeywordIndex.probeManyRange(spark, dir,
        queries, minScore = bar)
      .as[(Long, Long, Double)].collect().toSeq
    val rangeSingle = queries.flatMap { case (q, ts) =>
      KeywordIndex.probeRange(spark, dir, ts, minScore = bar)
        .as[(Long, Double)].collect().toSeq
        .map { case (id, sc) => (q, id, sc) }
    }
    assert(rangeBatched == rangeSingle,
      "batched range pages must equal the per-qid range probes")
    assert(rangeBatched.nonEmpty, "bar chosen non-vacuous")
    intercept[IllegalArgumentException] {
      KeywordIndex.probeManyRange(spark, dir, queries, minScore = 0.0)
    }
  }

  test("k: tenant overlay — probeTopKTenant ≡ the scoped filtered " +
      "serve ≡ in-query BM25 over the tenant's docs; unknown tenant " +
      "serves empty; guards hold") {
    val corpus = corpusOf(30)
    val dir = tmp("kwtn")
    KeywordIndex.build(corpus, dir)
    // the unregistered serve fails loudly, never silently global
    intercept[IllegalArgumentException] {
      KeywordIndex.probeTopKTenant(spark, dir, terms, 6, "t0")
    }
    val assign = corpus.select($"doc_id",
      concat(lit("t"), $"doc_id" % 3).as("tenant"))
    KeywordIndex.registerTenants(spark, dir, assign)
    val t0docs = corpus.filter($"doc_id" % 3 === 0L)
    val expected = page(Relevance.bm25TopDocs(t0docs, terms, 6))
    assert(page(KeywordIndex.probeTopKTenant(spark, dir, terms, 6,
      "t0", zeroFill = true)) == expected,
      "tenant page must equal a dedicated subset-corpus ranking")
    assert(page(KeywordIndex.probeTopKFiltered(spark, dir, terms, 6,
      allowed = t0docs.select("doc_id"), zeroFill = true)) == expected,
      "tenant serve and ad-hoc scoped filtered serve must agree")
    // above-cap fallback (semi-join restriction): identical page
    assert(page(KeywordIndex.probeTopKTenant(spark, dir, terms, 6,
      "t0", zeroFill = true, pushdownCap = 0)) == expected,
      "semi-join fallback must serve the same tenant page")
    assert(KeywordIndex.probeTopKTenant(spark, dir, terms, 6,
      "nosuchtenant", zeroFill = true).isEmpty,
      "unknown tenant must serve an empty page")
    // guards: null tenant, duplicate id, non-live id
    intercept[IllegalArgumentException] {
      KeywordIndex.registerTenants(spark, dir,
        corpus.limit(2).select($"doc_id",
          lit(null).cast("string").as("tenant")))
    }
    intercept[IllegalArgumentException] {
      KeywordIndex.registerTenants(spark, dir,
        assign.filter($"doc_id" < 3)
          .unionByName(assign.filter($"doc_id" < 1)))
    }
    intercept[IllegalArgumentException] {
      KeywordIndex.registerTenants(spark, dir,
        Seq((999L, "tx")).toDF("doc_id", "tenant"))
    }
    // a rebuild drops the overlay (assignments named the old
    // generation) — the tenant serve fails loudly until re-registered
    KeywordIndex.build(corpus, dir)
    intercept[IllegalArgumentException] {
      KeywordIndex.probeTopKTenant(spark, dir, terms, 6, "t0")
    }
  }

  test("k: probeRangeTenant — threshold serve equals the tenant " +
      "deep top-k filtered at the bar; scoped scores, not global; " +
      "contract guards hold") {
    val corpus = corpusOf(30)
    val dir = tmp("kwtr")
    KeywordIndex.build(corpus, dir)
    KeywordIndex.registerTenants(spark, dir,
      corpus.select($"doc_id",
        concat(lit("t"), $"doc_id" % 3).as("tenant")))
    val bar = 1.0 // bisects the 30-doc fixture's t0 candidate scores
    def rows(df: DataFrame) = df.select("doc_id", "score")
      .as[(Long, Double)].collect().toSet
    val got = rows(KeywordIndex.probeRangeTenant(spark, dir, terms,
      bar, "t0"))
    // ≡ the tenant deep top-k (same scoring spine) filtered at the
    // bar — and non-trivially bisecting (some docs in, some out)
    val deep = KeywordIndex.probeTopKTenant(spark, dir, terms, 1000,
        "t0")
      .select("doc_id", "score").as[(Long, Double)].collect()
    assert(got == deep.filter(_._2 >= bar).toSet,
      "range page must equal the deep tenant top-k at the bar")
    assert(got.nonEmpty && deep.exists(_._2 < bar),
      "the bar must bisect the fixture scores")
    // the scores are the SCOPED model's (tenant gauge stats), not
    // the global corpus's
    val globalAtBar = rows(KeywordIndex.probeRange(spark, dir, terms,
      bar))
    assert(got.exists(r => !globalAtBar.contains(r)),
      "scoped threshold scores must differ from the global model's")
    // above-cap fallback identical; unknown tenant empty; bar > 0
    assert(rows(KeywordIndex.probeRangeTenant(spark, dir, terms, bar,
      "t0", pushdownCap = 0)) == got)
    assert(KeywordIndex.probeRangeTenant(spark, dir, terms, bar,
      "nosuch").isEmpty)
    intercept[IllegalArgumentException] {
      KeywordIndex.probeRangeTenant(spark, dir, terms, 0.0, "t0")
    }
  }

  test("k: tenant gauges fold through assign/remove/compact/merge/" +
      "absorb — the tenant page tracks the live∩tenant set at every " +
      "lifecycle point, and health pins the gauge") {
    def metric(df: DataFrame, m: String): Double =
      df.filter($"metric" === m).select("value").as[Double].head()
    def tenantOf(df: DataFrame): DataFrame =
      df.select($"doc_id", concat(lit("t"), $"doc_id" % 2).as("tenant"))
    val seed = corpusOf(20)
    val dir = tmp("kwtlc")
    KeywordIndex.build(seed, dir)
    KeywordIndex.registerTenants(spark, dir, tenantOf(seed))
    // append a batch, assign its tenants (same rule)
    val batch = corpusOf(10, from = 100L)
    KeywordIndex.append(batch, dir)
    KeywordIndex.assignTenants(spark, dir, tenantOf(batch))
    // double-assignment guard
    intercept[IllegalArgumentException] {
      KeywordIndex.assignTenants(spark, dir, tenantOf(batch.limit(1)))
    }
    val all = seed.unionByName(batch)
    assert(page(KeywordIndex.probeTopKTenant(spark, dir, terms, 6,
      "t1", zeroFill = true)) ==
      page(Relevance.bm25TopDocs(
        all.filter($"doc_id" % 2 === 1L), terms, 6)),
      "post-assign tenant page must cover seed + batch")
    // retract across both tenants; gauge must subtract per tenant
    val gone = all.filter($"doc_id" % 5 === 0L)
    KeywordIndex.remove(gone, dir)
    val live = all.filter($"doc_id" % 5 =!= 0L).localCheckpoint()
    val t1 = live.filter($"doc_id" % 2 === 1L)
    assert(page(KeywordIndex.probeTopKTenant(spark, dir, terms, 6,
      "t1", zeroFill = true)) ==
      page(Relevance.bm25TopDocs(t1, terms, 6)),
      "post-remove tenant page must track live∩tenant")
    // health pins the tenant gauges against the overlay-derived truth
    val h1 = KeywordIndex.health(spark, dir)
    assert(metric(h1, "tgauge_n_docs") ==
        metric(h1, "tenanted_docs_live") &&
      metric(h1, "tgauge_sum_dl") == metric(h1, "tenanted_dl_live"),
      "tenant gauges must equal the live-derived truth under " +
        "pending tombstones")
    // compact materializes the tombstones in the overlay too
    KeywordIndex.compact(spark, dir)
    val h2 = KeywordIndex.health(spark, dir)
    assert(metric(h2, "tgauge_n_docs") ==
        metric(h2, "tenanted_docs_live") &&
      metric(h2, "n_tombstoned") == 0d,
      "compacted overlay must agree with the gauges, tombstones gone")
    assert(page(KeywordIndex.probeTopKTenant(spark, dir, terms, 6,
      "t1", zeroFill = true)) ==
      page(Relevance.bm25TopDocs(t1, terms, 6)),
      "post-compact tenant page unchanged")
    // merge: two registered shards; gauges sum by tenant
    val shardB = corpusOf(12, from = 200L)
    val dirB = tmp("kwtlcB")
    KeywordIndex.build(shardB, dirB)
    KeywordIndex.registerTenants(spark, dirB, tenantOf(shardB))
    val merged = tmp("kwtlcM")
    KeywordIndex.merge(spark, Seq(dir, dirB), merged)
    val unionT1 = t1.unionByName(shardB.filter($"doc_id" % 2 === 1L))
    assert(page(KeywordIndex.probeTopKTenant(spark, merged, terms, 6,
      "t1", zeroFill = true)) ==
      page(Relevance.bm25TopDocs(unionT1, terms, 6)),
      "merged tenant page must equal the union tenant corpus")
    // absorb a registered shard into the live index
    val shardC = corpusOf(8, from = 300L)
    val dirC = tmp("kwtlcC")
    KeywordIndex.build(shardC, dirC)
    KeywordIndex.registerTenants(spark, dirC, tenantOf(shardC))
    KeywordIndex.absorb(spark, dirC, dir)
    val absorbedT1 = t1.unionByName(shardC.filter($"doc_id" % 2 === 1L))
    assert(page(KeywordIndex.probeTopKTenant(spark, dir, terms, 6,
      "t1", zeroFill = true)) ==
      page(Relevance.bm25TopDocs(absorbedT1, terms, 6)),
      "absorbed tenant page must cover target + shard")
    val h3 = KeywordIndex.health(spark, dir)
    assert(metric(h3, "tgauge_n_docs") ==
        metric(h3, "tenanted_docs_live") &&
      metric(h3, "tgauge_sum_dl") == metric(h3, "tenanted_dl_live"),
      "absorbed tenant gauges must equal the live-derived truth")
  }

  test("k: probeManyTenant ≡ the per-qid single tenant probes — " +
      "scoped stats per tenant, repeated tenants across qids, " +
      "unknown tenant serves an empty page, guards hold") {
    def tenantOf(df: DataFrame): DataFrame =
      df.select($"doc_id", concat(lit("t"), $"doc_id" % 3).as("tenant"))
    val corpus = corpusOf(30)
    val dir = tmp("kwmt")
    KeywordIndex.build(corpus, dir)
    // overlay required, loudly
    intercept[IllegalArgumentException] {
      KeywordIndex.probeManyTenant(spark, dir,
        Seq((0L, terms, "t0")), 5)
    }
    KeywordIndex.registerTenants(spark, dir, tenantOf(corpus))
    // lifecycle noise: a retraction so liveness must bind per tenant
    KeywordIndex.remove(corpus.filter($"doc_id" % 7 === 0L), dir)
    val queries = Seq(
      (0L, terms, "t0"),
      (1L, Seq("theta", "kappa"), "t1"),
      (2L, Seq("alpha"), "t0"), // repeated tenant, different terms
      (3L, terms, "nosuchtenant"))
    val got = KeywordIndex.probeManyTenant(spark, dir, queries, 5)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val want = queries.flatMap { case (q, ts, tn) =>
      page(KeywordIndex.probeTopKTenant(spark, dir, ts, 5, tn))
        .map { case (r, id, sc) => (q, r, id, sc) }
    }.sortBy(x => (x._1, x._2))
    assert(got == want,
      "batched tenant pages must equal the per-qid single probes")
    assert(!got.exists(_._1 == 3L),
      "unknown tenant must contribute an empty page")
    // above-cap union grant: same pages through the hull path
    intercept[IllegalArgumentException] {
      KeywordIndex.probeManyTenant(spark, dir,
        Seq((0L, terms, "t0"), (0L, terms, "t1")), 5)
    }
    intercept[IllegalArgumentException] {
      KeywordIndex.probeManyTenant(spark, dir,
        Seq((0L, Seq("alpha", "alpha"), "t0")), 5)
    }
  }

  test("k: staged rebuild CARRIES the tenant overlay — the carried " +
      "serve equals a fresh registration of the surviving " +
      "assignments, retrained-away docs drop out, new docs are " +
      "untenanted until assigned") {
    def tenantOf(df: DataFrame): DataFrame =
      df.select($"doc_id", concat(lit("t"), $"doc_id" % 2).as("tenant"))
    def metric(df: DataFrame, m: String): Double =
      df.filter($"metric" === m).select("value").as[Double].head()
    val seed = corpusOf(20)
    val dir = tmp("kwtcar")
    KeywordIndex.build(seed, dir)
    KeywordIndex.registerTenants(spark, dir, tenantOf(seed))
    // lifecycle noise before the retrain: an appended+assigned batch
    // and a cross-tenant retraction with pending tombstones
    val batch = corpusOf(8, from = 100L)
    KeywordIndex.append(batch, dir)
    KeywordIndex.assignTenants(spark, dir, tenantOf(batch))
    val all = seed.unionByName(batch)
    KeywordIndex.remove(all.filter($"doc_id" % 5 === 0L), dir)
    val live = all.filter($"doc_id" % 5 =!= 0L).localCheckpoint()
    // retrain over the survivors plus NEW (never-tenanted) docs
    val fresh = corpusOf(4, from = 200L)
    val retrained = live.unionByName(fresh).localCheckpoint()
    KeywordIndex.rebuildStaged(retrained, dir)
    // the carried serve ≡ a fresh registerTenants of the surviving
    // assignments on a twin of the same rebuild — page AND gauges
    val twin = tmp("kwtcarT")
    KeywordIndex.build(retrained, twin)
    KeywordIndex.registerTenants(spark, twin, tenantOf(live))
    for (par <- 0L to 1L) {
      val got = page(KeywordIndex.probeTopKTenant(spark, dir, terms,
        6, s"t$par", zeroFill = true))
      assert(got == page(KeywordIndex.probeTopKTenant(spark, twin,
        terms, 6, s"t$par", zeroFill = true)),
        s"t$par: carried overlay page != fresh-registration twin")
      assert(got == page(Relevance.bm25TopDocs(
        live.filter($"doc_id" % 2 === par), terms, 6)),
        s"t$par: carried overlay page != in-query over live ∩ tenant")
    }
    val h = KeywordIndex.health(spark, dir)
    assert(metric(h, "tgauge_n_docs") == metric(h, "tenanted_docs_live")
        && metric(h, "tgauge_sum_dl") == metric(h, "tenanted_dl_live"),
      "carried gauges must equal the overlay-derived truth")
    // the new docs are untenanted: assigning them extends the carried
    // overlay exactly as it would a freshly-registered one
    KeywordIndex.assignTenants(spark, dir, tenantOf(fresh))
    assert(page(KeywordIndex.probeTopKTenant(spark, dir, terms, 6,
      "t1", zeroFill = true)) ==
      page(Relevance.bm25TopDocs(live.unionByName(fresh)
        .filter($"doc_id" % 2 === 1L), terms, 6)),
      "post-carry assignment must extend the overlay")
  }

  test("k: assignTenants crash window fails LOUDLY — the gauge is " +
      "deleted before the assignment shard lands and written last, " +
      "so mid-crash residue (assignments without tstats) can never " +
      "serve silently under-counted scoped statistics") {
    def tenantOf(df: DataFrame): DataFrame =
      df.select($"doc_id", concat(lit("t"), $"doc_id" % 2).as("tenant"))
    val seed = corpusOf(20)
    val dir = tmp("kwtcrash")
    KeywordIndex.build(seed, dir)
    KeywordIndex.registerTenants(spark, dir, tenantOf(seed))
    val batch = corpusOf(6, from = 100L)
    KeywordIndex.append(batch, dir)
    // the crash residue assignTenants' ordering guarantees: the
    // assignment shard present, the gauge asset GONE (a crash between
    // the delete and the final write) — simulated directly
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    batch.select($"doc_id", concat(lit("t"), $"doc_id" % 2)
        .as("tenant")).select($"doc_id".as("id"), $"tenant")
      .write.mode("append").parquet(s"$dir/tenants")
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/tstats"), true)
    intercept[Exception] {
      KeywordIndex.probeTopKTenant(spark, dir, terms, 6, "t1").count()
    }
    // recovery = re-register, exactly as the error posture documents
    KeywordIndex.registerTenants(spark, dir,
      tenantOf(seed.unionByName(batch)))
    assert(page(KeywordIndex.probeTopKTenant(spark, dir, terms, 6,
      "t1", zeroFill = true)) ==
      page(Relevance.bm25TopDocs(seed.unionByName(batch)
        .filter($"doc_id" % 2 === 1L), terms, 6)),
      "re-registration must restore the exact tenant page")
  }

  test("k: health pins the SERVING stats gauge — a silently-drifted " +
      "stats/ asset surfaces as gauge-vs-live divergence") {
    val corpus = corpusOf(18)
    val dir = tmp("kwgauge")
    KeywordIndex.build(corpus, dir)
    def metric(df: DataFrame, m: String): Double =
      df.filter($"metric" === m).select("value").as[Double].head()
    // uncorrupted: the gauge rows twin the doclens-derived rows, so
    // the k5 stored-vs-derived pin now covers the serving asset too
    val ok = KeywordIndex.health(spark, dir)
    assert(metric(ok, "n_docs_gauge") == metric(ok, "n_docs_live") &&
      metric(ok, "sum_dl_gauge") == metric(ok, "sum_dl_live"),
      "fresh build: gauge rows must equal the doclens-derived truth")
    // drift the gauge the way a missed lifecycle fold would (stats/
    // content wrong, every other asset intact): probes keep running —
    // they would serve wrong BM25 scores — and health must be the
    // frame that surfaces it
    spark.range(1)
      .select(lit(metric(ok, "n_docs_live").toLong + 7L).as("n_docs"),
        lit(1L).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$dir/stats")
    val bad = KeywordIndex.health(spark, dir)
    assert(metric(bad, "n_docs_gauge") != metric(bad, "n_docs_live"),
      "drifted n_docs gauge must diverge from n_docs_live")
    assert(metric(bad, "sum_dl_gauge") != metric(bad, "sum_dl_live"),
      "drifted sum_dl gauge must diverge from sum_dl_live")
    val derived = KeywordIndex.healthFromCorpus(corpus)
    assert(!bad.exceptAll(derived).isEmpty,
      "the stored-vs-derived pin must catch the drifted gauge")
  }

  // the (n_docs, sum_dl) gauge must equal the doclens-derived truth
  // after ANY lifecycle point — the invariant the O(1) probe
  // statistics rest on
  private def assertStatsGauge(dir: String, what: String): Unit = {
    val gauge = spark.read.parquet(s"$dir/stats")
      .as[(Long, Long)].head()
    val truth = StoredIndex.filterTombstones(spark, dir,
        spark.read.parquet(s"$dir/doclens"), "id")
      .agg(count(lit(1L)), coalesce(sum($"dl"), lit(0L)))
      .as[(Long, Long)].head()
    assert(gauge == truth,
      s"$what: stats gauge $gauge != doclens-derived $truth")
  }

  test("k: 10 random tenant-overlay interleavings — assigned/" +
      "unassigned appends, cross-tenant removes, REASSIGN moves, " +
      "unassign + resurrect re-adds, compact, registered and " +
      "unregistered absorbs, rebuild+re-register — keep every " +
      "tenant page exact and the gauges equal to the derived truth") {
    val trnd = new scala.util.Random(83)
    def tdoc(): String =
      Seq.fill(6 + trnd.nextInt(7))(vocab(trnd.nextInt(vocab.size)))
        .mkString(" ")
    def metric(df: DataFrame, m: String): Double =
      df.filter($"metric" === m).select("value").as[Double].head()
    def assignOf(docs: Seq[(Long, String)]): DataFrame =
      docs.toDF("doc_id", "text").select($"doc_id",
        concat(lit("t"), $"doc_id" % 2).as("tenant"))
    for (seqNo <- 1 to 10) {
      val pool = (0L until 26L).map(i => (i, tdoc()))
      var cursor = 10
      var live = pool.take(10).toMap
      // the EXPLICIT id → tenant truth (no longer derivable from the
      // id parity: reassign moves ids across tenants, unassign ends
      // membership, resurrect re-adds — coverage can be partial)
      var assigned: Map[Long, String] =
        live.keySet.map(id => id -> s"t${id % 2}").toMap
      val dir = tmp(s"kwtr$seqNo")
      KeywordIndex.build(live.toSeq.toDF("doc_id", "text"), dir)
      KeywordIndex.registerTenants(spark, dir, assignOf(live.toSeq))
      for (_ <- 1 to 6) trnd.nextInt(9) match {
        case 0 if cursor < pool.size => // append + assign
          val batch = pool.slice(cursor,
            math.min(cursor + 2 + trnd.nextInt(3), pool.size))
          cursor += batch.size
          KeywordIndex.append(batch.toDF("doc_id", "text"), dir)
          KeywordIndex.assignTenants(spark, dir, assignOf(batch))
          live ++= batch
          assigned ++= batch.map(b => b._1 -> s"t${b._1 % 2}")
        case 1 if cursor < pool.size => // append WITHOUT assigning
          val batch = pool.slice(cursor,
            math.min(cursor + 1 + trnd.nextInt(2), pool.size))
          cursor += batch.size
          KeywordIndex.append(batch.toDF("doc_id", "text"), dir)
          live ++= batch
        case 2 if live.size > 4 => // cross-tenant retract
          val gone = live.toSeq.sortBy(_._1)
            .filter(_ => trnd.nextInt(3) == 0).take(live.size - 3)
          if (gone.nonEmpty) {
            KeywordIndex.remove(gone.toDF("doc_id", "text"), dir)
            live --= gone.map(_._1); assigned --= gone.map(_._1)
          }
        case 3 =>
          KeywordIndex.compact(spark, dir)
        case 4 if cursor < pool.size => // absorb, registered or not
          val batch = pool.slice(cursor,
            math.min(cursor + 2 + trnd.nextInt(2), pool.size))
          cursor += batch.size
          val shard = tmp(s"kwtrs$seqNo")
          KeywordIndex.build(batch.toDF("doc_id", "text"), shard)
          val registered = trnd.nextBoolean()
          if (registered)
            KeywordIndex.registerTenants(spark, shard, assignOf(batch))
          KeywordIndex.absorb(spark, shard, dir)
          live ++= batch
          if (registered)
            assigned ++= batch.map(b => b._1 -> s"t${b._1 % 2}")
        case 5 => // staged rebuild CARRIES the surviving overlay;
          // half the time re-register to parity coverage, half the
          // time serve straight off the carried assignments
          KeywordIndex.rebuildStaged(
            live.toSeq.toDF("doc_id", "text"), dir)
          if (trnd.nextBoolean()) {
            KeywordIndex.registerTenants(spark, dir,
              assignOf(live.toSeq))
            assigned = live.keySet.map(id => id -> s"t${id % 2}").toMap
          } // else: carried — `assigned` (⊆ live) is unchanged
        case 6 if assigned.nonEmpty => // REASSIGN: flip a random
          // slice across tenants — one gauge fold, overlay tombstone
          // + append/resurrect, never a re-registration
          val moved = assigned.toSeq.sortBy(_._1)
            .filter(_ => trnd.nextInt(3) == 0)
          if (moved.nonEmpty) {
            val rows = moved.map { case (id, tn) =>
              (id, if (tn == "t0") "t1" else "t0") }
            KeywordIndex.reassignTenants(spark, dir,
              rows.toDF("doc_id", "tenant"))
            assigned ++= rows.toMap
          }
        case 7 if assigned.size > 2 => // unassign a slice: docs stay
          // LIVE, membership ends, gauges subtract
          val gone = assigned.keySet.toSeq.sorted
            .filter(_ => trnd.nextInt(4) == 0)
          if (gone.nonEmpty) {
            KeywordIndex.unassignTenants(spark, dir,
              gone.toDF("doc_id"))
            assigned --= gone
          }
        case 8 => // re-assign untenanted live ids to a RANDOM tenant
          // — resurrects a tombstoned pair when the tenant matches a
          // previously-held one, appends fresh otherwise
          val holes = (live.keySet -- assigned.keySet).toSeq.sorted
            .filter(_ => trnd.nextInt(2) == 0)
          if (holes.nonEmpty) {
            val rows = holes.map(id => (id, s"t${trnd.nextInt(2)}"))
            KeywordIndex.assignTenants(spark, dir,
              rows.toDF("doc_id", "tenant"))
            assigned ++= rows.toMap
          }
        case _ => ()
      }
      val liveDf = live.toSeq.toDF("doc_id", "text").localCheckpoint()
      val assignedDf = assigned.toSeq.toDF("doc_id", "tenant")
        .localCheckpoint()
      for (par <- 0L to 1L) {
        val tdocs = liveDf.join(
          assignedDf.filter($"tenant" === s"t$par").select("doc_id"),
          Seq("doc_id"), "left_semi")
        val got = page(KeywordIndex.probeTopKTenant(spark, dir, terms,
          6, s"t$par", zeroFill = true))
        assert(got == page(Relevance.bm25TopDocs(tdocs, terms, 6)),
          s"seq $seqNo tenant t$par: stored page != in-query over " +
            "live ∩ assigned")
      }
      val h = KeywordIndex.health(spark, dir)
      assert(metric(h, "tgauge_n_docs") ==
          metric(h, "tenanted_docs_live") &&
        metric(h, "tgauge_sum_dl") == metric(h, "tenanted_dl_live"),
        s"seq $seqNo: tenant gauges != overlay-derived truth")
    }
  }

  test("k: unassign/reassign guards are LOUD — not-assigned ids, " +
      "same-tenant moves, empty unassigns; a crash window inside " +
      "either leaves the gauge absent and the scoped serve loud") {
    val docs = Seq((1L, "data shuffle query"), (2L, "query plan data"),
      (3L, "stream data data")).toDF("doc_id", "text")
    val dir = tmp("kwrg")
    KeywordIndex.build(docs, dir)
    KeywordIndex.registerTenants(spark, dir,
      docs.select($"doc_id",
        concat(lit("t"), $"doc_id" % 2).as("tenant")))
    // not currently assigned (id 9 is not even live): loud on both
    intercept[IllegalArgumentException] {
      KeywordIndex.unassignTenants(spark, dir, Seq(9L).toDF("doc_id"))
    }
    intercept[IllegalArgumentException] {
      KeywordIndex.reassignTenants(spark, dir,
        Seq((9L, "t0")).toDF("doc_id", "tenant"))
    }
    // same-tenant "move" is a refused no-op (id 1 is in t1)
    intercept[IllegalArgumentException] {
      KeywordIndex.reassignTenants(spark, dir,
        Seq((1L, "t1")).toDF("doc_id", "tenant"))
    }
    // empty unassign is a caller bug
    intercept[IllegalArgumentException] {
      KeywordIndex.unassignTenants(spark, dir,
        spark.range(0).select($"id".as("doc_id")))
    }
    // unassign id 2 (t0), then unassigning it AGAIN is loud (no
    // live assignment row anymore)
    KeywordIndex.unassignTenants(spark, dir, Seq(2L).toDF("doc_id"))
    intercept[IllegalArgumentException] {
      KeywordIndex.unassignTenants(spark, dir, Seq(2L).toDF("doc_id"))
    }
    // ... but assignTenants re-adds it (resurrection of the SAME
    // pair — the physical row comes back, not a duplicate)
    KeywordIndex.assignTenants(spark, dir,
      Seq((2L, "t0")).toDF("doc_id", "tenant"))
    val page0 = KeywordIndex.probeTopKTenant(spark, dir,
      Seq("data"), 5, "t0").select("doc_id").as[Long].collect().toSet
    assert(page0 == Set(2L), "resurrected pair must serve again")
    val h = KeywordIndex.health(spark, dir)
    def metric(m: String): Double =
      h.filter($"metric" === m).select("value").as[Double].head()
    assert(metric("tgauge_n_docs") == metric("tenanted_docs_live"),
      "gauges must equal the overlay truth after the round-trip")
  }

  test("k: phrase serving — adjacency exactness incl. overlapping " +
      "and repeated-term phrases; append/remove/compact track the " +
      "live set; merge unions (and a positions-free side drops the " +
      "asset fail-closed); tenant grant + unassign compose; " +
      "pre-positions indexes fail loudly") {
    val pdocs = Seq(
      (1L, "data query plan data query"), // "data query" x2
      (2L, "query data query"),           // x1
      (3L, "data data data"),             // overlap: "data data" x2
      (4L, "plan scan merge"),            // no match
      (5L, "the cat the")                 // repeated-term phrase
    ).toDF("doc_id", "text").localCheckpoint()
    val dir = tmp("kwph")
    KeywordIndex.build(pdocs, dir)
    def phr(d: String, phrase: Seq[String]): Seq[(Long, Long)] =
      KeywordIndex.probePhrase(spark, d, phrase)
        .as[(Long, Long)].collect().toSeq
    assert(phr(dir, Seq("data", "query")) == Seq((1L, 2L), (2L, 1L)))
    // OVERLAPPING occurrences both count (positions, not tf-pairs)
    assert(phr(dir, Seq("data", "data")) == Seq((3L, 2L)))
    // repeated-term phrase reuses the slice at different shifts
    assert(phr(dir, Seq("the", "cat", "the")) == Seq((5L, 1L)))
    // a single-term "phrase" degenerates to tf
    assert(phr(dir, Seq("data")) ==
      Seq((1L, 2L), (2L, 1L), (3L, 3L)))
    // proximity: min pairwise distance over the occurrence lists,
    // slop-filtered (doc 1: data=[0,3], plan=[2] → min dist 1);
    // same-term and slop < 1 refuse loudly
    assert(KeywordIndex.probeProximity(spark, dir, "data", "plan",
        slop = 1).as[(Long, Long)].collect().toSeq == Seq((1L, 1L)))
    assert(KeywordIndex.probeProximity(spark, dir, "data", "cat",
        slop = 5).isEmpty, "no co-occurrence must serve empty")
    intercept[IllegalArgumentException] {
      KeywordIndex.probeProximity(spark, dir, "data", "data", 2)
    }
    intercept[IllegalArgumentException] {
      KeywordIndex.probeProximity(spark, dir, "data", "plan", 0)
    }
    // lifecycle: append extends, remove retracts, compact holds
    KeywordIndex.append(
      Seq((6L, "big data query end")).toDF("doc_id", "text"), dir)
    assert(phr(dir, Seq("data", "query")) ==
      Seq((1L, 2L), (2L, 1L), (6L, 1L)))
    KeywordIndex.remove(
      Seq((1L, "data query plan data query")).toDF("doc_id", "text"),
      dir)
    assert(phr(dir, Seq("data", "query")) == Seq((2L, 1L), (6L, 1L)))
    KeywordIndex.compact(spark, dir)
    assert(phr(dir, Seq("data", "query")) == Seq((2L, 1L), (6L, 1L)),
      "compact must materialize positions tombstones and keep pages")
    // guards: empty phrase; pre-positions index (asset dropped) —
    // and an append to a positions-free index stays positions-free
    intercept[IllegalArgumentException] {
      KeywordIndex.probePhrase(spark, dir, Seq.empty)
    }
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/positions"), true)
    val ex = intercept[IllegalArgumentException] {
      KeywordIndex.probePhrase(spark, dir, Seq("data"))
    }
    assert(ex.getMessage.contains("rebuild"))
    KeywordIndex.append(
      Seq((7L, "data query tail")).toDF("doc_id", "text"), dir)
    intercept[IllegalArgumentException] {
      KeywordIndex.probePhrase(spark, dir, Seq("data", "query"))
    }
    // rebuild regains the asset; tenant grant composes with the
    // overlay tombstones (unassign ends phrase visibility)
    KeywordIndex.build(pdocs, dir)
    KeywordIndex.registerTenants(spark, dir,
      pdocs.select($"doc_id",
        concat(lit("t"), $"doc_id" % 2).as("tenant")))
    def tphr(tn: String): Seq[(Long, Long)] =
      KeywordIndex.probePhraseTenant(spark, dir,
        Seq("data", "query"), tn).as[(Long, Long)].collect().toSeq
    assert(tphr("t1") == Seq((1L, 2L)))
    assert(tphr("t0") == Seq((2L, 1L)))
    assert(tphr("nope").isEmpty)
    KeywordIndex.unassignTenants(spark, dir, Seq(1L).toDF("doc_id"))
    assert(tphr("t1").isEmpty,
      "unassigned doc must leave the tenant's phrase page")
    // merge: both sides positional → union; a stripped side → the
    // merged index drops the asset (fail-closed, loud)
    val (shA, shB) = (tmp("kwphA"), tmp("kwphB"))
    KeywordIndex.build(pdocs.filter($"doc_id" <= 2), shA)
    KeywordIndex.build(
      Seq((8L, "data query again")).toDF("doc_id", "text"), shB)
    val m1 = tmp("kwphM") + "/m1"
    KeywordIndex.merge(spark, Seq(shA, shB), m1)
    assert(phr(m1, Seq("data", "query")) ==
      Seq((1L, 2L), (2L, 1L), (8L, 1L)))
    fs.delete(new org.apache.hadoop.fs.Path(s"$shB/positions"), true)
    val m2 = tmp("kwphM2") + "/m2"
    KeywordIndex.merge(spark, Seq(shA, shB), m2)
    intercept[IllegalArgumentException] {
      KeywordIndex.probePhrase(spark, m2, Seq("data", "query"))
    }
    // absorb of a positions-free shard drops the target's asset too
    KeywordIndex.absorb(spark, shB, shA)
    intercept[IllegalArgumentException] {
      KeywordIndex.probePhrase(spark, shA, Seq("data", "query"))
    }
  }

  test("k: 20 random append/remove/compact/re-append/merge/absorb/" +
      "staged-rebuild interleavings serve the in-query page") {
    val lrnd = new scala.util.Random(61)
    def ldoc(): String =
      Seq.fill(6 + lrnd.nextInt(7))(vocab(lrnd.nextInt(vocab.size)))
        .mkString(" ")
    var nonVacuous = 0
    for (seqNo <- 1 to 20) {
      val pool = (0L until 28L).map(i => (i, ldoc()))
      var cursor = 10
      var live = pool.take(10).toMap
      var pending = Map.empty[Long, String]
      var purged = Map.empty[Long, String]
      var dir = tmp(s"kwrand$seqNo")
      KeywordIndex.build(live.toSeq.toDF("doc_id", "text"), dir)
      var removedOnce = false
      for (_ <- 1 to 4) lrnd.nextInt(7) match {
        case 0 if cursor < pool.size =>
          val batch = pool.slice(cursor,
            math.min(cursor + 3 + lrnd.nextInt(4), pool.size))
          cursor += batch.size
          KeywordIndex.append(batch.toDF("doc_id", "text"), dir)
          live ++= batch
        case 1 if live.size > 4 =>
          val gone = live.toSeq.sortBy(_._1)
            .filter(_ => lrnd.nextInt(3) == 0).take(live.size - 3)
          if (gone.nonEmpty) {
            KeywordIndex.remove(gone.toDF("doc_id", "text"), dir)
            live --= gone.map(_._1); pending ++= gone
            removedOnce = true
          }
        case 2 =>
          KeywordIndex.compact(spark, dir)
          purged ++= pending; pending = Map.empty
        case 3 if purged.nonEmpty =>
          val (id, txt) = purged.toSeq.minBy(_._1)
          KeywordIndex.append(Seq((id, txt)).toDF("doc_id", "text"), dir)
          live += id -> txt; purged -= id
        case 4 if cursor < pool.size =>
          val batch = pool.slice(cursor,
            math.min(cursor + 2 + lrnd.nextInt(3), pool.size))
          cursor += batch.size
          val shard = tmp(s"kwrs$seqNo")
          KeywordIndex.build(batch.toDF("doc_id", "text"), shard)
          val mergedDir = tmp(s"kwrm$seqNo")
          KeywordIndex.merge(spark, Seq(dir, shard), mergedDir)
          dir = mergedDir
          live ++= batch
        case 5 if cursor < pool.size =>
          val batch = pool.slice(cursor,
            math.min(cursor + 2 + lrnd.nextInt(3), pool.size))
          cursor += batch.size
          val shard = tmp(s"kwra$seqNo")
          KeywordIndex.build(batch.toDF("doc_id", "text"), shard)
          KeywordIndex.absorb(spark, shard, dir)
          live ++= batch
        case 6 =>
          KeywordIndex.rebuildStaged(
            live.toSeq.toDF("doc_id", "text"), dir)
          purged ++= pending; pending = Map.empty
        case _ => ()
      }
      val liveDf = live.toSeq.toDF("doc_id", "text").localCheckpoint()
      assertServes(dir, liveDf, topN = 6, what = s"sequence $seqNo")
      assertStatsGauge(dir, s"sequence $seqNo")
      assert(!KeywordIndex.ensure(liveDf, dir),
        s"sequence $seqNo: meta must stay content-fresh for survivors")
      if (removedOnce) nonVacuous += 1
    }
    assert(nonVacuous >= 6,
      s"only $nonVacuous sequences exercised retraction — weak seed")
  }
}
