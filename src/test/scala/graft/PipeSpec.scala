package graft

import org.apache.spark.sql.functions._
import graft.ext.{Chunking, Curation}
import graft.ops.Scd2

/** Unit coverage for the pipeline-lifecycle operators behind
  * PipeQueries (u1/u2/c4/c5/e6): SCD2 rebuild + merge semantics on
  * hand-built change logs, chunk window arithmetic at the edges, and
  * the determinism/consistency contracts of the split and the epoch
  * shuffle. */
class PipeSpec extends SparkTestBase {
  import spark.implicits._

  private def tsv(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2 fromLog compresses repeats and versions the changes") {
    val log = Seq(
      (1L, "2024-01-01 00:00:00", "A", 1L),
      (1L, "2024-01-02 00:00:00", "A", 2L), // repeat — compressed away
      (1L, "2024-01-03 00:00:00", "B", 3L),
      (1L, "2024-01-04 00:00:00", "A", 4L), // value may recur later
      (2L, "2024-01-01 00:00:00", "X", 5L)
    ).map { case (k, t, v, id) => (k, tsv(t), v, id) }
      .toDF("user_id", "ts", "status", "event_id")
    val got = Scd2.fromLog(log, "user_id", "ts", "status", "event_id")
      .orderBy("user_id", "valid_from")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSeq
    assert(got === Seq(
      (1L, "A", tsv("2024-01-01 00:00:00"), Some(tsv("2024-01-03 00:00:00"))),
      (1L, "B", tsv("2024-01-03 00:00:00"), Some(tsv("2024-01-04 00:00:00"))),
      (1L, "A", tsv("2024-01-04 00:00:00"), None),
      (2L, "X", tsv("2024-01-01 00:00:00"), None)))
  }

  test("scd2 fromLog breaks equal-timestamp ties by the tie column") {
    val t0 = tsv("2024-01-01 00:00:00")
    val log = Seq((1L, t0, "B", 2L), (1L, t0, "A", 1L))
      .toDF("user_id", "ts", "status", "event_id")
    val got = Scd2.fromLog(log, "user_id", "ts", "status", "event_id")
      .orderBy("valid_from", "status").collect()
    // event 1 (A) precedes event 2 (B): A closes out at t0, B stays open
    assert(got.map(_.getString(1)).toSeq === Seq("A", "B"))
    assert(got.count(_.isNullAt(3)) === 1)
  }

  test("scd2 applyChanges closes, opens, passes through, and inserts") {
    val cur = Seq((1L, "GOLD"), (2L, "SILVER"), (3L, "GOLD"))
      .toDF("k", "seg")
      .withColumn("valid_from", lit(tsv("2024-01-01 00:00:00")))
    // key 1 changes, key 2 no-op churn (same value), key 4 is a NEW
    // entity (no open row) — the "not matched by target" MERGE arm:
    // it must surface as a fresh open version, not be silently dropped
    val upd = Seq((1L, "BRONZE"), (2L, "SILVER"), (4L, "NEW"))
      .toDF("k", "seg")
    val eff = lit(tsv("2024-02-01 00:00:00"))
    val got = Scd2.applyChanges(cur, upd, "k", "seg", eff)
      .orderBy("k", "valid_from")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSeq
    assert(got === Seq(
      (1L, "GOLD", tsv("2024-01-01 00:00:00"), Some(tsv("2024-02-01 00:00:00"))),
      (1L, "BRONZE", tsv("2024-02-01 00:00:00"), None),
      (2L, "SILVER", tsv("2024-01-01 00:00:00"), None),
      (3L, "GOLD", tsv("2024-01-01 00:00:00"), None),
      (4L, "NEW", tsv("2024-02-01 00:00:00"), None)))
  }

  test("chunk windows overlap, cover every token, no redundant tails") {
    // 10 tokens, size 4, overlap 2 -> starts 0,2,4,6. A start-8 chunk
    // "t9 t10" would be a pure suffix of the start-6 chunk — redundant
    // training content — so starts stop once the window adds no new
    // token (start < n - overlap).
    val docs = Seq((7L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Chunking.chunk(docs, size = 4, overlap = 2)
      .orderBy("chunk_id")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got.map(_._2) === Seq(0L, 1L, 2L, 3L))
    assert(got.head._3 === "t1 t2 t3 t4")
    assert(got(1)._3 === "t3 t4 t5 t6")
    assert(got.last._3 === "t7 t8 t9 t10") // every token covered
    assert(got.map(_._4) === Seq(4L, 4L, 4L, 4L))
    // short tail still kept when it carries new tokens: 9 tokens ->
    // starts 0,2,4,6 with the last chunk 3 tokens long
    val nine = Seq((1L, (1 to 9).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val tail = Chunking.chunk(nine, 4, 2).orderBy("chunk_id")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(tail.last._3 === "t7 t8 t9" && tail.last._4 === 3L)
  }

  test("chunk rejects degenerate configs and keeps single-window docs") {
    intercept[IllegalArgumentException](
      Chunking.chunk(Seq((1L, "a b")).toDF("doc_id", "text"), 4, 4))
    val one = Chunking.chunk(
      Seq((1L, "a b c")).toDF("doc_id", "text"), size = 8, overlap = 2)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(one === Seq((1L, 0L, "a b c", 3L)))
  }

  test("splitAssign is exhaustive, deterministic, and growth-stable") {
    val docs = (1L to 500L).toDF("doc_id")
    val assign = Curation.splitAssign(docs, "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05), rest = "test")
    val counts = assign.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum === 500L)
    assert(counts("train") > 400L) // ~450 expected at p=0.9
    // consistency: the same keys keep their split inside a superset
    val grown = Curation.splitAssign((1L to 1000L).toDF("doc_id"), "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05), rest = "test")
    val before = assign.as[(Long, String)].collect().toMap
    val after = grown.filter($"doc_id" <= 500).as[(Long, String)]
      .collect().toMap
    assert(before === after)
  }

  test("bloom dedup == exact incremental dedup, even at brutal FPP") {
    val corpus = (1L to 60L).map(i => (i, s"corpus doc number $i"))
      .toDF("doc_id", "text")
    val batch = ((100L to 129L).map(i => (i, s"corpus doc number ${i - 99}"))
      ++ (200L to 229L).map(i => (i, s"fresh doc number $i"))
      ++ Seq((300L, "fresh doc number 200"))) // in-batch dup of id 200
      .toDF("doc_id", "text")
    val exact = graft.ext.Dedup.incrementalDedup(batch, corpus)
      .select("doc_id").as[Long].collect().sorted
    // 64 bits for 60 items: nearly every membership probe returns
    // true, so the exact-verify join carries the result — correctness
    // must not depend on the filter being selective
    val bloom = graft.ext.Dedup.bloomIncrementalDedup(batch, corpus,
      expectedItems = 60L, numBits = 64L)
      .select("doc_id").as[Long].collect().sorted
    assert(bloom === exact)
    assert(exact === (200L to 229L).toArray) // dups out, in-batch dup out
  }

  test("bloom dedup on an empty corpus keeps every batch survivor") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val got = graft.ext.Dedup.bloomIncrementalDedup(batch, corpus)
      .select("doc_id").as[Long].collect().sorted
    assert(got === Array(1L, 3L)) // in-batch dedup still applies
  }

  test("expectations count violations with IS NOT TRUE null semantics") {
    import graft.ops.Expectations
    val df = Seq[(java.lang.Long, String)]((1L, "A"), (2L, null),
      (null, "B"), (2L, "A")).toDF("k", "v")
    val rows = Expectations.report(Seq(
      Expectations.rowChecks(df, Seq(
        "k_pos" -> (col("k") > 0),        // null k -> violation
        "v_domain" -> col("v").isin("A")) // null v and "B" -> violations
      ),
      Expectations.uniquenessCheck(df, "k_unique", Seq("k"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows === Array(
      ("k_pos", 4L, 1L), ("k_unique", 4L, 1L), ("v_domain", 4L, 2L)))
  }

  test("referential check: null FKs checked but not violations") {
    import graft.ops.Expectations
    val child = Seq[java.lang.Long](1L, 5L, null).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Expectations.referentialCheck(child, "fk", parent, "pk", "fk_ok")
      .collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2)) === (("fk_ok", 3L, 1L)))
  }

  test("expectations on an EMPTY batch report zero violations, not null") {
    import graft.ops.Expectations
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val parent = Seq(1L).toDF("pk")
    val rows = Expectations.report(Seq(
      Expectations.rowChecks(empty, Seq("k_pos" -> (col("k") > 0))),
      Expectations.referentialCheck(empty, "k", parent, "pk", "fk_ok")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows === Array(("fk_ok", 0L, 0L), ("k_pos", 0L, 0L)))
  }

  test("splitAssign with fractions summing to 1 leaves nothing to rest") {
    // the slot space is 16-bit; 'ffff' keys must land in the LAST
    // named split, not leak to the rest label (the 1.0 boundary clamp)
    val docs = (1L to 2000L).toDF("doc_id")
    val counts = Curation.splitAssign(docs, "doc_id",
      Seq("train" -> 0.95, "val" -> 0.05), rest = "leak")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("leak"), s"rows leaked to rest: $counts")
    assert(counts.values.sum === 2000L)
  }

  test("delta-agg avg divides by non-null values, not row count") {
    import graft.ops.DeltaAgg
    val rows = Seq[(String, Option[Double])](("g", Some(1.0)), ("g", None))
      .toDF("g", "v")
    val r = DeltaAgg.finish(
      DeltaAgg.partialSums(rows, Seq("g"), $"v"), Seq("g")).collect().head
    assert(r.getLong(1) === 2L)        // n counts rows
    assert(r.getDouble(3) === 1.0)     // avg = 1.0/1, not 1.0/2
    // all-null group: avg must be NULL, not a division blow-up
    val nulls = Seq[(String, Option[Double])](("h", None)).toDF("g", "v")
    val h = DeltaAgg.finish(
      DeltaAgg.partialSums(nulls, Seq("g"), $"v"), Seq("g")).collect().head
    assert(h.isNullAt(3))
  }

  test("rowChecks: every rule rides one aggregate pass (single scan)") {
    import graft.ops.Expectations
    val li = graft.queries.Q.t(spark, sf001, "lineitem")
    val plan = Expectations.rowChecks(li, Seq(
      "a" -> (col("l_quantity") > 0), "b" -> (col("l_discount") <= 1),
      "c" -> col("l_returnflag").isNotNull))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan for 3 rules, got $scans in:\n$plan")
  }

  test("snapshotDiff classifies added/removed/changed; null-safe") {
    import graft.ops.Scd2
    val before = Seq((1L, Some("a"), 10.0), (2L, None, 5.0),
      (3L, Some("c"), 1.0)).toDF("k", "name", "bal")
    val after = Seq((1L, Some("a"), 10.0),   // unchanged -> dropped
      (2L, Some("b"), 5.0),                  // null -> value = changed
      (4L, Some("d"), 2.0))                  // new key; 3 removed
      .toDF("k", "name", "bal")
    val got = Scd2.snapshotDiff(before, after, "k", Seq("name", "bal"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got === Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("delta-agg merge is batch-boundary independent (monoid state)") {
    import graft.ops.DeltaAgg
    val rows = (1 to 100).map(i => (s"g${i % 3}", i * 0.37))
      .toDF("g", "v")
    val oneShot = DeltaAgg.finish(
      DeltaAgg.partialSums(rows, Seq("g"), $"v"), Seq("g"))
      .orderBy("g").collect().toSeq
    // three uneven batches, merged pairwise in a different order
    val Seq(b1, b2, b3) = Seq($"v" < 10, $"v" >= 10 && $"v" < 30, $"v" >= 30)
      .map(f => DeltaAgg.partialSums(rows.filter(f), Seq("g"), $"v"))
    val merged = DeltaAgg.finish(
      DeltaAgg.merge(b3, DeltaAgg.merge(b1, b2, Seq("g")), Seq("g")),
      Seq("g")).orderBy("g").collect().toSeq
    assert(merged === oneShot)
  }

  test("epochShuffle permutes deterministically and differs by epoch") {
    val docs = (1L to 100L).toDF("doc_id")
    val e1a = Curation.epochShuffle(docs, "doc_id", 1)
      .select("doc_id").as[Long].collect().toSeq
    val e1b = Curation.epochShuffle(docs, "doc_id", 1)
      .select("doc_id").as[Long].collect().toSeq
    val e2 = Curation.epochShuffle(docs, "doc_id", 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(e1a === e1b)                   // reproducible
    assert(e1a !== e2)                    // epoch changes the permutation
    assert(e1a.sorted === (1L to 100L))   // it is a permutation
    assert(e1a !== (1L to 100L).toSeq)    // and not the identity
  }

  test("kAnonymityCheck counts rows in under-k groups, NULL is a value") {
    import graft.ops.Expectations
    val df = Seq(
      ("us", "A"), ("us", "A"), ("us", "A"),   // group of 3: safe at k=3
      ("de", "B"), ("de", "B"),                // group of 2: 2 violations
      (null.asInstanceOf[String], "C")         // NULL group of 1: 1 violation
    ).toDF("country", "seg")
    val r = Expectations.kAnonymityCheck(df, Seq("country", "seg"), k = 3)
      .as[(String, Long, Long)].first()
    assert(r == ("k_anonymity", 6L, 3L))
    // k=1 can never be violated; empty input checks nothing
    val r1 = Expectations.kAnonymityCheck(df, Seq("country"), k = 1)
      .as[(String, Long, Long)].first()
    assert(r1 == ("k_anonymity", 6L, 0L))
    val empty = df.filter(lit(false))
    val r0 = Expectations.kAnonymityCheck(empty, Seq("country"), k = 3)
      .as[(String, Long, Long)].first()
    assert(r0 == ("k_anonymity", 0L, 0L))
  }

  test("scrubBoilerplateLines drops shared lines, keeps order and rows") {
    import graft.ext.TextAnalysis
    val docs = Seq(
      (0L, "unique intro zero\nsubscribe to our newsletter\nreal body zero"),
      (1L, "subscribe to our newsletter\nreal body one\ncookie banner text"),
      (2L, "cookie banner text\nsubscribe to our newsletter"),
      (3L, "totally unique document with one line")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubBoilerplateLines(docs, minDocs = 2)
      .as[(Long, String)].collect().toMap
    // boilerplate ("subscribe…" in 3 docs, "cookie…" in 2) gone;
    // unique lines survive in original order
    assert(out(0L) == "unique intro zero\nreal body zero")
    assert(out(1L) == "real body one")
    assert(out(3L) == "totally unique document with one line")
    // a doc that was ALL boilerplate keeps its row, empty text
    assert(out(2L) == "")
    assert(out.size == 4)
    // threshold respected: at minDocs = 4 nothing repeats enough
    val loose = TextAnalysis.scrubBoilerplateLines(docs, minDocs = 4)
      .as[(Long, String)].collect().toMap
    assert(loose == docs.as[(Long, String)].collect().toMap)
    // repeats WITHIN one doc do not make a line boilerplate
    // (count is distinct docs, not occurrences)
    val intra = Seq((0L, "same line\nsame line\nother"), (1L, "unrelated"))
      .toDF("doc_id", "text")
    val kept = TextAnalysis.scrubBoilerplateLines(intra, minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(kept(0L) == "same line\nsame line\nother")
  }

  test("vocabCoverage reports the OOV occurrence fraction at the budget") {
    import graft.ext.Relevance
    // 10 token occurrences, 4 types; top-2 vocab = {a (4x), b (3x)}
    // (count desc). OOV occurrences = c(2) + d(1) = 3 → rate 0.3
    val docs = Seq((0L, "a a b c"), (1L, "a b d"), (2L, "a b c"))
      .toDF("doc_id", "text")
    val r = Relevance.vocabCoverage(docs, vocabSize = 2)
      .as[(Long, Long, Double)].first()
    assert(r == ((10L, 4L, 0.3)))
    // a budget covering every type has zero OOV
    val full = Relevance.vocabCoverage(docs, vocabSize = 10)
      .as[(Long, Long, Double)].first()
    assert(full == ((10L, 4L, 0.0)))
  }
}
