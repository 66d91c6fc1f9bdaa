package graft

import org.apache.spark.sql.functions._

import graft.ext.{Curation, Relevance, TextAnalysis}

/** Behavioral tests for the curation/relevance operators (t6-t10,
  * e3-e4): PII redaction positive matches (the corpus query only
  * checks pass-through), TF-IDF/BM25 ranking shape, and the
  * determinism contracts of hash sampling / balanced capping. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("redactPii replaces planted URL/email/IP/phone with placeholders") {
    val planted = Seq(
      (0L, "contact me at alice.smith+x@example.org or 555-123-4567 now"),
      (1L, "see https://example.com/a/b?x=1 and host 10.0.255.3 please"),
      (2L, "clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    val out = planted.select($"doc_id",
      TextAnalysis.redactPii($"text").as("clean"),
      TextAnalysis.PiiPatterns.map { case (_, p, _) =>
        TextAnalysis.piiCount($"text", p)
      }.reduceLeft(_ + _).as("hits")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

    assert(out(0L)._1 == "contact me at [EMAIL] or [PHONE] now")
    assert(out(0L)._2 == 2L)
    assert(out(1L)._1 == "see [URL] and host [IP] please")
    assert(out(1L)._2 == 2L)
    assert(out(2L) == ("clean text with no identifiers at all", 0L))
  }

  test("redactPii consumes URL-embedded addresses as part of the URL") {
    // the URL pattern runs first, so an address inside a URL must not
    // leave a dangling [EMAIL]/[IP] inside the [URL] placeholder
    val df = Seq((0L, "ref http://10.1.2.3/path?mail=bob@example.com end"))
      .toDF("doc_id", "text")
    val clean = df.select(TextAnalysis.redactPii($"text")).head.getString(0)
    assert(clean == "ref [URL] end")
  }

  test("scrubStopwords drops stopword tokens and rejoins") {
    val df = Seq((0L, "the quick fox is in a hole")).toDF("doc_id", "text")
    val out = df.select(
      TextAnalysis.scrubStopwords($"text", TextAnalysis.EnglishStopwords),
      TextAnalysis.stopwordCount($"text", TextAnalysis.EnglishStopwords))
      .head
    assert(out.getString(0) == "quick fox hole")
    assert(out.getInt(1) == 4) // the, is, in, a
  }

  test("repetitionScore measures duplicated n-gram fraction") {
    val df = Seq(
      (0L, "a b a b"),        // tokens: 2/4 dup; 3-grams "a b a","b a b" distinct
      (1L, "x x x x x"),      // tokens: 4/5 dup; 3-grams: 3x "x x x" → 2/3
      (2L, "one two")         // too short for 3-grams → 0
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TextAnalysis.repetitionScore($"text", 1).as("r1"),
      TextAnalysis.repetitionScore($"text", 3).as("r3"))
      .as[(Long, Double, Double)].collect().toSeq
    assert(out == Seq((0L, 0.5, 0.0), (1L, 0.8, 0.6667), (2L, 0.0, 0.0)))
  }

  private val corpus = Seq(
    (0L, "apple apple banana"),
    (1L, "banana cherry"),
    (2L, "cherry cherry cherry durian")
  ).toDF("doc_id", "text")

  test("tfidfTopTerms ranks doc-exclusive terms above common ones") {
    val top = Relevance.tfidfTopTerms(corpus, k = 2)
      .as[(Long, Int, String, Double)].collect()
    val byDoc = top.groupBy(_._1).map { case (d, rs) =>
      d -> rs.sortBy(_._2).map(_._3).toSeq }
    // apple: tf=2 and df=1 → dominates doc 0; banana (df=2) second
    assert(byDoc(0L) == Seq("apple", "banana"))
    // durian is doc 2's exclusive term; tf=3 cherry (df=2) still wins:
    // 3·ln(1.5) ≈ 1.216 > 1·ln(3) ≈ 1.099
    assert(byDoc(2L) == Seq("cherry", "durian"))
    // ranks are dense 1..k per doc
    assert(top.groupBy(_._1).values.forall(
      _.map(_._2).sorted.toSeq == Seq(1, 2)))
  }

  test("bm25TopDocs puts the query-term-dense doc first, scores descend") {
    val docs = Seq(
      (0L, "spark spark spark table"),
      (1L, "spark table row"),
      (2L, "nothing relevant here at all"),
      (3L, "table table spark spark row row")
    ).toDF("doc_id", "text")
    val out = Relevance.bm25TopDocs(docs, Seq("spark", "table"), topN = 4)
      .as[(Int, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1, 2, 3, 4))
    // scores non-increasing in rank
    assert(out.sliding(2).forall(w => w(0)._3 >= w(1)._3))
    // the no-match doc scores exactly 0 and lands last
    assert(out.last._2 == 2L && out.last._3 == 0.0)
    // every other doc has positive relevance
    assert(out.init.forall(_._3 > 0.0))
  }

  test("deterministicSample matches a driver-side md5 oracle and is " +
       "stable under repartitioning") {
    val keys = (0L until 1000L)
    val df = keys.toDF("k")
    val picked = Curation.deterministicSample(df, "k", "1a")
      .as[Long].collect().toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = keys.filter { k =>
      val hex = md.digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex.substring(0, 2) < "1a"
    }.toSet
    assert(picked == expected)
    // ~26/256 ≈ 10% nominal rate; loose bounds for the 1000-key draw
    assert(picked.size > 50 && picked.size < 200)
    // layout-independence: same selection from any partitioning
    val repicked = Curation.deterministicSample(df.repartition(7), "k", "1a")
      .as[Long].collect().toSet
    assert(repicked == picked)
  }

  test("balancedTopK caps every group at k and keeps the best-ordered rows") {
    val df = Seq(
      ("en", 0L, 0.9), ("en", 1L, 0.8), ("en", 2L, 0.7), ("en", 3L, 0.9),
      ("de", 4L, 0.5), ("de", 5L, 0.6),
      ("fr", 6L, 0.1)
    ).toDF("lang", "doc_id", "quality")
    val out = Curation.balancedTopK(df, "lang", 2,
      $"quality".desc, $"doc_id".asc)
      .select("lang", "doc_id", "rank")
      .as[(String, Long, Int)].collect().toSet
    assert(out == Set(
      ("en", 0L, 1), ("en", 3L, 2), // 0.9 ties break toward lower id
      ("de", 5L, 1), ("de", 4L, 2),
      ("fr", 6L, 1)))
  }

  test("histogram bins by fixed width and accounts for every row") {
    val df = Seq(3L, 9L, 10L, 19L, 20L, 25L, 107L).toDF("v")
    val out = Curation.histogram(df, $"v", 10)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L), (10L, 2L), (20L, 2L), (100L, 1L)))
    assert(out.map(_._2).sum == 7L)
  }

  test("winsorize clamps to the exact group percentile band") {
    // group a: 1..20 plus a fat-finger 1000; group b: all equal
    val df = (((1 to 20).map(i => ("a", i.toDouble)) :+ ("a", 1000.0)) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 5.0))).toDF("g", "v")
    val out = Curation.winsorize(df, "g", "v", 0.05, 0.95)
    // recompute the clip mechanically from the same percentile
    // definition and compare multiset-exact
    val bounds = df.groupBy("g")
      .agg(percentile($"v", lit(0.05)).as("lo"),
           percentile($"v", lit(0.95)).as("hi"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val expect = df.as[(String, Double)].collect()
      .map { case (g, v) =>
        val (lo, hi) = bounds(g); (g, math.min(math.max(v, lo), hi)) }
      .groupBy(identity).view.mapValues(_.length).toMap
    val got = out.as[(String, Double)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got == expect)
    // the outlier actually clipped, the degenerate group untouched
    assert(got.keys.filter(_._1 == "a").map(_._2).max < 1000.0)
    assert(got(("b", 5.0)) == 3)
  }

  test("winsorize approx route keeps count and tames the outlier") {
    val df = ((1 to 200).map(i => ("a", i.toDouble)) :+ ("a", 1e9))
      .toDF("g", "v")
    val out = Curation.winsorize(df, "g", "v", 0.05, 0.95, exact = false)
      .as[(String, Double)].collect()
    assert(out.length == 201)
    // GK bounds are dataset elements near the target rank, so the
    // clipped max must be a value from the bulk, not the outlier
    assert(out.map(_._2).max <= 200.0)
    assert(out.map(_._2).min >= 1.0)
    // interior values pass through untouched
    assert(out.count(_._2 == 100.0) == 1)
  }

  test("temperatureMix keeps the rarest class whole; alpha=1 is identity") {
    val df = ((1L to 400L).map(i => (i, "big")) ++
      (401L to 410L).map(i => (i, "small"))).toDF("doc_id", "cls")
    // alpha = 1: natural distribution, every rate is exactly 1.0
    assert(Curation.temperatureMix(df, "cls", alpha = 1.0).count() == 410L)
    val out = Curation.temperatureMix(df, "cls", alpha = 0.5)
      .groupBy("cls").count()
      .as[(String, Long)].collect().toMap
    // the rarest class's rate is exactly max/max = 1.0 → all 10 kept
    assert(out("small") == 10L)
    // the dominant class downsamples toward sqrt-flattening
    // (expected keep rate sqrt(10/400) ≈ 0.158; md5 slots realize it
    // up to sampling noise on 400 keys)
    assert(out("big") < 200L && out("big") > 20L, out.toString)
    intercept[IllegalArgumentException](
      Curation.temperatureMix(df, "cls", alpha = 0.0))
    intercept[IllegalArgumentException](
      Curation.temperatureMix(df, "cls", alpha = 1.5))
  }

  test("winsorize keeps NULL groups and NULL values intact") {
    val df = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(2.0)), (Some("a"), Some(3.0)),
      (Some("a"), None),                      // NULL value: must stay NULL
      (None, Some(10.0)), (None, Some(20.0)), (None, Some(1000.0)),
      (Some("b"), None), (Some("b"), None)    // all-NULL group: pass-through
    ).toDF("g", "v")
    val out = Curation.winsorize(df, "g", "v", 0.25, 0.75)
      .as[(Option[String], Option[Double])].collect()
    assert(out.length == 9, "winsorize must never drop rows")
    // the NULL group is a group: its fat-finger 1000.0 clips to ITS
    // own band, not to group a's and not to a pass-through
    val nullGroup = out.filter(_._1.isEmpty).flatMap(_._2)
    assert(nullGroup.length == 3 && nullGroup.max < 1000.0, nullGroup.toSeq)
    // NULL values survive as NULL (not fabricated into the lo bound)
    assert(out.count(_._2.isEmpty) == 3)
  }

  test("winsorize rejects an inverted or out-of-range band") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException](
      Curation.winsorize(df, "g", "v", 0.9, 0.5))
    intercept[IllegalArgumentException](
      Curation.winsorize(df, "g", "v", -0.1, 0.5))
  }
}
