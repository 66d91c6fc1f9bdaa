package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.Sessions
import graft.streaming.{StatefulSessions, StreamingAnnIngest,
  StreamingBronzeIngest, StreamingOps}
import graft.taxi.TaxiFixtures

/** Streaming surface tests: batch/stream parity for the stateful
  * sessionizer, and the foreachBatch bronze ingest producing the same
  * warehouse state as the batch path. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("stateful sessionizer == batch sessionizer on replayed events") {
    val events = graft.queries.Q.t(spark, sf001, "events")
    val batch = Sessions.sessionize(events, gapMinutes = 30)
    // a session is emitted when a later event closes it, or when the
    // final watermark (max ts - 1 min, ms precision) passes its
    // end + gap timeout; only sessions ending within 31 min of the
    // stream's end stay open and unemitted
    val maxTsMs = events.agg(max($"ts")).first().getTimestamp(0).getTime
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session_id").as("last_id"))
    val expected = batch.join(lastPerUser, "user_id")
      .filter($"session_id" < $"last_id" ||
        lit(maxTsMs) - unix_millis($"session_end") > lit(31 * 60000L))
      .select("user_id", "session_id", "session_start", "session_end",
        "n_events", "sum_value")

    val streamed = StatefulSessions.replayEvents(spark, sf001, 30)
      .select("user_id", "session_id", "session_start", "session_end",
        "n_events", "sum_value")

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
  }

  test("bounded-state dedup == batch DISTINCT on the day-bucketed key (st4)") {
    val events = graft.queries.Q.t(spark, sf001, "events")
    val expected = events.select($"user_id", $"event_type",
      date_trunc("day", $"ts").as("ts_day")).distinct()
    val streamed = StreamingOps.streamingDedupBounded(spark, sf001)
    assert(streamed.count() == expected.count())
    assert(streamed.exceptAll(expected).isEmpty &&
      expected.exceptAll(streamed).isEmpty)
  }

  test("stream-stream interval join == batch interval join (st5)") {
    val events = graft.queries.Q.t(spark, sf001, "events")
    val imp = events.filter($"event_id" % 2 === 0)
      .select($"event_id".as("imp_id"), $"user_id", $"ts".as("imp_ts"))
    val click = events.filter($"event_id" % 2 === 1)
      .select($"event_id".as("click_id"), $"user_id".as("c_user"),
        $"ts".as("click_ts"))
    val expected = imp.join(click,
      $"user_id" === $"c_user" && $"click_ts" >= $"imp_ts" &&
        $"click_ts" <= $"imp_ts" + expr("interval 10 minutes"))
      .select("imp_id", "click_id", "user_id", "imp_ts", "click_ts")
    val streamed = StreamingOps.streamStreamIntervalJoin(spark, sf001)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(expected).isEmpty &&
      expected.exceptAll(streamed).isEmpty)
  }

  test("stream-stream LEFT OUTER join == batch left join + watermark filter (st9)") {
    val events = graft.queries.Q.t(spark, sf001, "events")
    val imp = events.filter($"event_id" % 2 === 0)
      .select($"event_id".as("imp_id"), $"user_id", $"ts".as("imp_ts"))
    val click = events.filter($"event_id" % 2 === 1)
      .select($"event_id".as("click_id"), $"user_id".as("c_user"),
        $"ts".as("click_ts"))
    // final watermark: min of the two sides' max ts, minus the 1 h
    // delay — a null-extended impression may only emit once its
    // 10-minute window closed before that watermark
    val wm = math.min(
      imp.agg(max($"imp_ts")).first().getTimestamp(0).getTime,
      click.agg(max($"click_ts")).first().getTimestamp(0).getTime
    ) - 3600 * 1000L
    val matched = imp.join(click,
      $"user_id" === $"c_user" && $"click_ts" >= $"imp_ts" &&
        $"click_ts" <= $"imp_ts" + expr("interval 10 minutes"))
      .select("imp_id", "click_id", "user_id", "imp_ts", "click_ts")
    val unmatched = imp.join(click,
        $"user_id" === $"c_user" && $"click_ts" >= $"imp_ts" &&
          $"click_ts" <= $"imp_ts" + expr("interval 10 minutes"),
        "left_anti")
      .filter(unix_millis($"imp_ts") + 10 * 60000L < wm)
      .select($"imp_id", lit(null).cast("long").as("click_id"),
        $"user_id", $"imp_ts", lit(null).cast("timestamp").as("click_ts"))
    val expected = matched.unionByName(unmatched)

    val streamed = StreamingOps.streamStreamLeftOuterJoin(spark, sf001)
    assert(streamed.filter($"click_id".isNull).count() > 0,
      "no null-extended rows — left-outer degenerated to inner")
    assert(streamed.exceptAll(expected).isEmpty &&
      expected.exceptAll(streamed).isEmpty)
  }

  test("stream-static enrich == batch join+group (st8)") {
    val events = graft.queries.Q.t(spark, sf001, "events")
    val dim = spark.read.parquet(s"$sf001/customer.parquet")
      .select($"c_custkey", $"c_mktsegment")
    val expected = events.join(dim, $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        graft.ops.Ops.sumMoney($"value").as("sum_value"))
    val streamed = StreamingOps.streamStaticEnrich(spark, sf001)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(expected).isEmpty &&
      expected.exceptAll(streamed).isEmpty)
  }

  test("soak: bounded dedup state across 12 micro-batches + mid-run restart") {
    // The st* parity tests replay one file into one micro-batch; this
    // is the day-long-run shape: 12 hourly files forced into 12
    // separate micro-batches (maxFilesPerTrigger=1), a checkpoint
    // restart halfway through the stream, and per-batch state-store
    // metrics proving dropDuplicatesWithinWatermark EVICTS — state
    // stays ~delay-sized while the key universe keeps growing.
    import org.apache.spark.sql.streaming.Trigger
    val src = Files.createTempDirectory("graft_soak_src_").toString
    val ckpt = Files.createTempDirectory("graft_soak_ckpt_").toString
    val out = Files.createTempDirectory("graft_soak_out_").toString

    // file i: 10 fresh keys [10i, 10i+9], each TWICE (in-batch dups),
    // all stamped hour i — so the 90-minute delay keeps ~2 files of
    // keys live and everything older is evictable
    def writeFile(i: Int): Unit = {
      val ts = java.sql.Timestamp.valueOf(f"2024-01-01 $i%02d:00:00")
      val keys = (0 until 10).map(j => i * 10L + j)
      (keys ++ keys).map(k => (k, ts)).toDF("user_id", "ts")
        .repartition(1).write.mode("append").parquet(src)
    }

    // parquet sink (memory sinks cannot recover from a checkpoint);
    // restart proof comes from the output dir and batch counts
    def runPhase() = {
      val q = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "90 minutes")
        .dropDuplicatesWithinWatermark("user_id")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val progress = q.recentProgress.filter(_.numInputRows > 0)
      val stateRows = q.recentProgress.toSeq
        .flatMap(_.stateOperators.map(_.numRowsTotal))
      (progress.length, stateRows)
    }

    (0 until 6).foreach(writeFile)
    val (batchesA, stateA) = runPhase()
    assert(batchesA === 6, s"expected 6 data micro-batches, got $batchesA")
    // 10 fresh keys per file, in-batch duplicates dropped
    assert(spark.read.parquet(out).count() === 60L)

    // restart MID-STREAM from the same checkpoint: only the 6 new
    // files flow; nothing from phase A is reprocessed or re-emitted
    (6 until 12).foreach(writeFile)
    val (batchesB, stateB) = runPhase()
    assert(batchesB === 6, s"restart reprocessed old files: $batchesB")
    val all = spark.read.parquet(out)
    assert(all.count() === 120L, "restart re-emitted or dropped rows")
    assert(all.select("user_id").distinct().count() === 120L,
      "a key was emitted twice across the restart")

    // the soak claim itself: 120 distinct keys flowed through, but
    // the dedup state never held more than ~2-3 files' worth — the
    // watermark evicted the rest. (An unbounded dropDuplicates would
    // show numRowsTotal ramping to 60 within phase A alone.)
    val maxState = (stateA ++ stateB).max
    assert(maxState <= 40L,
      s"state not bounded by the watermark delay: max=$maxState rows " +
        s"(A=$stateA B=$stateB)")
    assert(stateB.last <= 30L, "state did not stay flat to stream end")
  }

  test("streaming bronze ingest == batch bronze ingest") {
    val whStream = Files.createTempDirectory("graft_whs_").toString
    val whBatch = Files.createTempDirectory("graft_whb_").toString
    val staging = Files.createTempDirectory("graft_staging_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString

    val batch1 = TaxiFixtures.monthBatch(spark, 2024, 1, rows = 500)
    batch1.write.mode("overwrite").parquet(staging)

    new StreamingBronzeIngest(spark, whStream).ingestAvailable(staging, ckpt)
    new Pipeline(spark, whBatch).bronzeLayer.ingest(batch1)

    val streamBronze = spark.read.parquet(s"$whStream/bronze/yellow_taxi_raw")
    val batchBronze = spark.read.parquet(s"$whBatch/bronze/yellow_taxi_raw")
    assert(streamBronze.count() == batchBronze.count())
    assert(streamBronze.exceptAll(batchBronze).isEmpty)

    // ledger row written through the stream too
    val meta = new graft.meta.MetaStore(spark, whStream)
    assert(meta.ledger.filter(col("status") === "success").count() >= 1)
  }

  test("streaming ingest restart resumes from checkpoint — no reprocessing") {
    val wh = Files.createTempDirectory("graft_whr_").toString
    val staging = Files.createTempDirectory("graft_stg2_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt2_").toString
    val ingest = new StreamingBronzeIngest(spark, wh)

    // the file-stream source watches top-level files: stage each
    // month's parquet part as a uniquely-named file in the root
    def stage(month: Int): Unit = {
      val tmp = Files.createTempDirectory("graft_part_")
      TaxiFixtures.monthBatch(spark, 2024, month, rows = 400)
        .coalesce(1).write.parquet(s"$tmp/out")
      val part = new java.io.File(s"$tmp/out").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath,
        java.nio.file.Paths.get(staging, f"month_$month%02d.parquet"))
    }

    stage(1)
    ingest.ingestAvailable(staging, ckpt)
    val afterFirst = spark.read.parquet(s"$wh/bronze/yellow_taxi_raw").count()
    assert(afterFirst > 0)

    // second run over the SAME checkpoint: month 1 is already
    // committed, so only the newly staged month flows through
    stage(2)
    ingest.ingestAvailable(staging, ckpt)
    val bronze = spark.read.parquet(s"$wh/bronze/yellow_taxi_raw")
    assert(bronze.count() > afterFirst)
    assert(bronze.select("pickup_month").distinct().count() == 2)

    // and a third run with nothing new staged is a complete no-op
    ingest.ingestAvailable(staging, ckpt)
    assert(spark.read.parquet(s"$wh/bronze/yellow_taxi_raw").count()
      == bronze.count())
  }

  test("streaming ANN ingest: build, append-only-new, restart no-op") {
    val ix = Files.createTempDirectory("graft_stann_").toString + "/ix"
    val staging = Files.createTempDirectory("graft_stann_stg_").toString
    val ckpt = Files.createTempDirectory("graft_stann_ck_").toString
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    val even = embs.filter($"vec_id" % 2 === 0)
    val odd = embs.filter($"vec_id" % 2 =!= 0)

    // single uniquely-named top-level files, like the bronze spec
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_stann_p_")
      df.coalesce(1).write.parquet(s"$tmp/out")
      val part = new java.io.File(s"$tmp/out").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath,
        java.nio.file.Paths.get(staging, s"$name.parquet"))
    }
    def postings() = spark.read.parquet(s"$ix/postings").count()

    val ingest = new StreamingAnnIngest(spark, ix)
    stage(even, "drop1")
    ingest.ingestAvailable(staging, ckpt)
    assert(postings() == even.count(), "first drop should BUILD")

    // second drop carries the odd half PLUS a re-delivered slice of
    // the even half: the already-indexed gate must skip the repeats
    stage(odd.unionByName(even.limit(7)), "drop2")
    ingest.ingestAvailable(staging, ckpt)
    assert(postings() == embs.count(), "append should index only new ids")

    // the streamed index is content-valid over the full corpus and
    // serves the same neighbors as a batch build(even)+append(odd)
    assert(!graft.ext.AnnIndex.ensure(embs, ix))
    val batchIx = Files.createTempDirectory("graft_stann_b_")
      .toString + "/ix"
    graft.ext.AnnIndex.build(even, batchIx)
    graft.ext.AnnIndex.append(odd, batchIx)
    val q = embs.filter($"vec_id" < 5)
    assert(
      graft.ext.AnnIndex.probeTopK(spark, ix, q, k = 3).collect().toSet ==
        graft.ext.AnnIndex.probeTopK(spark, batchIx, q, k = 3)
          .collect().toSet)

    // restart with nothing staged: checkpoint makes it a no-op
    ingest.ingestAvailable(staging, ckpt)
    assert(postings() == embs.count())
  }

  test("streaming dedup ingest: gate, quarantine, replay, crash rebuild") {
    import graft.ext.DedupIndex
    import graft.streaming.StreamingDedupIngest
    val root = Files.createTempDirectory("graft_stdd_").toString
    val (ix, corpusDir, quar) = (s"$root/ix", s"$root/corpus", s"$root/q")
    val staging = s"$root/staging"
    val ckpt = s"$root/ckpt"
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet

    val ingest = new StreamingDedupIngest(spark, ix, corpusDir, quar)
    val drop1 = docs.filter($"doc_id" < 250)
    StreamingDedupIngest.stage(drop1, staging, "drop1")
    ingest.ingestAvailable(staging, ckpt)
    assert(ids(ingest.corpus()) == ids(drop1), "first drop seeds corpus")

    // second drop: new docs + an EXACT dup of a corpus doc (must be
    // quarantined — identical text is always an LSH candidate and
    // jaccard 1.0) + a re-delivered slice of drop1 (must be skipped)
    val dupOfCorpus = docs.filter($"doc_id" === 0)
      .select(lit(9001L).as("doc_id"), $"text")
    val drop2 = docs.filter($"doc_id" >= 250 && $"doc_id" < 400)
    StreamingDedupIngest.stage(
      drop2.unionByName(dupOfCorpus).unionByName(drop1.limit(7)),
      staging, "drop2")
    ingest.ingestAvailable(staging, ckpt)
    val quarIds = ids(spark.read.parquet(quar))
    assert(quarIds.contains(9001L), s"exact dup must quarantine: $quarIds")
    val corpusIds = ids(ingest.corpus())
    assert(corpusIds == ids(drop1) ++ (ids(drop2) -- quarIds),
      "corpus = drop1 + clean drop2, re-delivery skipped")
    // the streamed index is content-fresh for the accumulated corpus
    assert(!DedupIndex.ensure(ingest.corpus(), ix))

    // gate consistency: probing a held-out batch through the
    // streamed index equals the direct one-shot gate over the
    // accumulated corpus
    val held = docs.filter($"doc_id" >= 400)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().toSet
    assert(pairs(DedupIndex.probe(held, ix, ingest.corpus(), 0.4)) ==
      pairs(graft.ext.Dedup.minhashIncrementalNearDups(
        held, ingest.corpus(), 0.4)))

    // restart with nothing staged: a no-op
    ingest.ingestAvailable(staging, ckpt)
    assert(ids(ingest.corpus()) == corpusIds)

    // crash INSIDE an append (meta gone, assets remain): unlike the
    // ANN ingest, the durable corpus store makes the safe remedy
    // automatic — rebuild from it, then keep ingesting
    val metaPath = new org.apache.hadoop.fs.Path(s"$ix/meta")
    metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(metaPath, true)
    val drop3 = docs.filter($"doc_id" >= 400 && $"doc_id" < 450)
    StreamingDedupIngest.stage(drop3, staging, "drop3")
    ingest.ingestAvailable(staging, ckpt)
    assert(!DedupIndex.ensure(ingest.corpus(), ix),
      "rebuilt-from-corpus index must be fresh for the grown corpus")
    assert(ids(ingest.corpus()).intersect(ids(drop3)).nonEmpty)
  }

  test("streaming dedup ingest: retract purges stores + index, idempotent") {
    import graft.ext.DedupIndex
    import graft.streaming.StreamingDedupIngest
    val root = Files.createTempDirectory("graft_strt_").toString
    val (ix, corpusDir, quar) = (s"$root/ix", s"$root/corpus", s"$root/q")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val ingest = new StreamingDedupIngest(spark, ix, corpusDir, quar)
    StreamingDedupIngest.stage(docs.filter($"doc_id" < 200),
      s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    // include an exact dup so the quarantine holds a copy to purge
    StreamingDedupIngest.stage(
      docs.filter($"doc_id" >= 200 && $"doc_id" < 300).unionByName(
        docs.filter($"doc_id" === 5)
          .select(lit(9001L).as("doc_id"), $"text")),
      s"$root/staging", "d2")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(ids(spark.read.parquet(quar)).contains(9001L))

    // takedown: doc 5 (ingested in drop1) AND its quarantined copy
    val gone = Seq(5L, 9001L, 150L).toDF("doc_id")
    ingest.retract(gone)
    assert(ids(ingest.corpus()).intersect(Set(5L, 150L)).isEmpty,
      "retracted docs must leave the corpus store")
    assert(!ids(spark.read.parquet(quar)).contains(9001L),
      "retracted docs must leave the quarantine too")
    // the index is content-fresh for the purged corpus — the XOR
    // un-mix, not a rebuild (meta still carries the stream's state)
    assert(!DedupIndex.ensure(ingest.corpus(), ix))
    // gate parity over the live remainder
    val held = docs.filter($"doc_id" >= 300 && $"doc_id" < 360)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().toSet
    assert(pairs(DedupIndex.probe(held, ix, ingest.corpus(), 0.4)) ==
      pairs(graft.ext.Dedup.minhashIncrementalNearDups(
        held, ingest.corpus(), 0.4)))
    // replaying the SAME takedown batch is a no-op
    ingest.retract(gone)
    assert(!DedupIndex.ensure(ingest.corpus(), ix))

    // crash residue: a previous retract purged the store but died
    // before the index remove — simulate by purging id 10 from the
    // store only, then retract it: the text needed for the XOR
    // un-mix is (correctly) gone, so retract must REBUILD from the
    // purged store and still end consistent
    val want10 = Seq(10L).toDF("doc_id")
    val m = classOf[StreamingDedupIngest]
      .getDeclaredMethod("purgeStore", classOf[String],
        classOf[org.apache.spark.sql.DataFrame])
    m.setAccessible(true)
    m.invoke(ingest, corpusDir,
      want10.select($"doc_id".cast("long").as("doc_id")))
    ingest.retract(want10)
    assert(!ids(ingest.corpus()).contains(10L))
    assert(!DedupIndex.ensure(ingest.corpus(), ix),
      "post-crash retract must leave a fresh index over the store")

    // STICKY takedown: even after compaction has materialized the
    // removal (no trace of the doc left anywhere in the index), a
    // re-delivered copy of a retracted doc must NOT be re-admitted —
    // the durable intent ledger outlives any replay window
    DedupIndex.compact(spark, ix)
    StreamingDedupIngest.stage(docs.filter($"doc_id" === 5),
      s"$root/staging", "redeliver5")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(!ids(ingest.corpus()).contains(5L),
      "re-delivered retracted doc must stay out (sticky ledger)")
    assert(!DedupIndex.ensure(ingest.corpus(), ix),
      "the dropped re-delivery must not desync store and index")

    // an idempotent takedown replay must not grow the intent ledger
    val ledger = corpusDir + "_retracted"
    val ledgerRows = spark.read.parquet(ledger).count()
    ingest.retract(gone)
    assert(spark.read.parquet(ledger).count() == ledgerRows,
      "replayed takedown must not append duplicate intent rows")

    // a batch whose rows are ALL retracted must still repair a
    // crashed (meta-less) index — the recovery check cannot be
    // short-circuited by the empty gate result
    val metaPath2 = new org.apache.hadoop.fs.Path(s"$ix/meta")
    val ixFs = metaPath2
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ixFs.delete(metaPath2, true)
    StreamingDedupIngest.stage(docs.filter($"doc_id" === 5),
      s"$root/staging", "redeliver5b")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(ixFs.exists(metaPath2),
      "an all-retracted batch must still rebuild the crashed index")
    assert(!DedupIndex.ensure(ingest.corpus(), ix))

    // fail CLOSED: an unreadable ledger aborts the batch rather than
    // silently disabling the retraction filter (failing open IS the
    // resurrection the ledger exists to prevent)
    new java.io.File(ledger).listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.write(f.toPath, Array.fill[Byte](32)(0x2a))
      }
    StreamingDedupIngest.stage(docs.filter($"doc_id" === 6),
      s"$root/staging", "drop6")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    }
  }

  test("streaming dedup ingest: auto-compaction bounds shard accretion") {
    import graft.ext.{DedupIndex, StoredIndex}
    import graft.streaming.StreamingDedupIngest
    val root = Files.createTempDirectory("graft_stcmp_").toString
    val (ix, corpusDir, quar) = (s"$root/ix", s"$root/corpus", s"$root/q")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    // compactAfterFiles = 1: every append that leaves >1 shard file
    // triggers a compaction, so the shard count cannot accrete with
    // the number of drops
    val ingest = new StreamingDedupIngest(spark, ix, corpusDir, quar,
      compactAfterFiles = 1)
    for (i <- 0 until 4) {
      StreamingDedupIngest.stage(
        docs.filter($"doc_id" >= i * 50 && $"doc_id" < (i + 1) * 50),
        s"$root/staging", s"drop$i")
      ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    }
    // a compacted rewrite writes at most one file per non-empty
    // shuffle partition (4 in the test session); without the
    // auto-compaction the 1-build + 3-append chain would hold at
    // least 4 accreted shard files PLUS whatever the builds wrote
    val files = StoredIndex.partFileCount(spark, ix, "buckets")
    assert(files <= 4,
      s"4 drops with compactAfterFiles=1 must stay compacted: $files")
    // the self-compacted index still serves the exact gate
    val held = docs.filter($"doc_id" >= 200 && $"doc_id" < 260)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().toSet
    assert(pairs(DedupIndex.probe(held, ix, ingest.corpus(), 0.4)) ==
      pairs(graft.ext.Dedup.minhashIncrementalNearDups(
        held, ingest.corpus(), 0.4)))
    assert(!DedupIndex.ensure(ingest.corpus(), ix))
  }

  test("streaming ANN ingest (store posture): retract purges store + index") {
    import graft.ext.AnnIndex
    import graft.streaming.StreamingDedupIngest.stage
    val root = Files.createTempDirectory("graft_stannrt_").toString
    val (ix, store) = (s"$root/ix", s"$root/store")
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").as[Long].collect().toSet
    val ingest = new graft.streaming.StreamingAnnIngest(spark, ix,
      storeDir = Some(store))
    val drop1 = embs.filter($"vec_id" < 300)
    val drop2 = embs.filter($"vec_id" >= 300)
    stage(drop1, s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(ids(ingest.store()) == ids(drop1), "first drop seeds store")
    // second drop + a re-delivered slice: the gate must skip repeats
    stage(drop2.unionByName(drop1.limit(7)), s"$root/staging", "d2")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(ids(ingest.store()) == ids(embs))
    assert(spark.read.parquet(s"$ix/postings").count() == embs.count())
    assert(!AnnIndex.ensure(embs, ix),
      "streamed index content-fresh over the full corpus")

    // takedown: purge 3 vectors — store loses them, the index
    // un-mixes them (XOR meta stays exact over the live remainder)
    val gone = Seq(5L, 150L, 400L).toDF("vec_id")
    val live = embs.filter(!$"vec_id".isin(5L, 150L, 400L))
      .localCheckpoint()
    ingest.retract(gone)
    assert(ids(ingest.store()).intersect(Set(5L, 150L, 400L)).isEmpty,
      "retracted vectors must leave the store")
    assert(!AnnIndex.ensure(live, ix),
      "post-retract index content-fresh over the LIVE corpus")
    // serve parity: tombstone serve == filtered serve over a batch
    // twin with the same build/append split
    val bix = Files.createTempDirectory("graft_stannrt_b_")
      .toString + "/ix"
    AnnIndex.build(drop1, bix)
    AnnIndex.append(drop2, bix)
    val q = embs.filter($"vec_id" < 5)
    assert(
      AnnIndex.probeTopK(spark, ix, q, k = 3).collect().toSet ==
        AnnIndex.probeTopKFiltered(spark, bix, q,
          live.select("vec_id"), k = 3).collect().toSet,
      "streamed tombstone serve != batch filtered serve")

    // idempotent replay: no ledger growth, nothing changes
    val ledgerRows = spark.read.parquet(store + "_retracted").count()
    ingest.retract(gone)
    assert(spark.read.parquet(store + "_retracted").count()
      == ledgerRows, "replayed takedown must not grow the ledger")
    assert(!AnnIndex.ensure(live, ix))

    // STICKY: compact materializes the tombstones (the raw-postings
    // anti-join stops filtering), then re-deliver a retracted id —
    // the ledger must keep it out (the ADVICE resurrection window)
    AnnIndex.compact(spark, ix)
    stage(embs.filter($"vec_id" === 5), s"$root/staging", "redeliver5")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(!ids(ingest.store()).contains(5L),
      "re-delivered retracted vector must stay out (sticky ledger)")
    assert(spark.read.parquet(s"$ix/postings")
      .filter($"nid" === 5L).isEmpty,
      "re-delivered retracted vector must not re-enter the postings")
    assert(!AnnIndex.ensure(live, ix))

    // crash residue: a prior retract purged the store but died
    // before the index remove — simulate via the purge hook, then
    // retract: the vector needed for the XOR un-mix is (correctly)
    // gone, so retract must REBUILD from the purged store
    val want17 = Seq(17L).toDF("vec_id")
    val m = classOf[graft.streaming.StreamingAnnIngest]
      .getDeclaredMethod("purgeStore", classOf[String],
        classOf[org.apache.spark.sql.DataFrame])
    m.setAccessible(true)
    m.invoke(ingest, store,
      want17.select($"vec_id".cast("long").as("vec_id")))
    ingest.retract(want17)
    assert(!ids(ingest.store()).contains(17L))
    assert(!AnnIndex.ensure(ingest.store(), ix),
      "post-crash retract must leave a fresh index over the store")
  }

  test("streaming ANN ingest (store posture): crash mid-append self-heals") {
    import graft.ext.AnnIndex
    import graft.streaming.StreamingDedupIngest.stage
    val root = Files.createTempDirectory("graft_stannsh_").toString
    val (ix, store) = (s"$root/ix", s"$root/store")
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    val ingest = new graft.streaming.StreamingAnnIngest(spark, ix,
      storeDir = Some(store))
    stage(embs.filter($"vec_id" < 200), s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    // crash INSIDE an append: meta gone, assets remain. Unlike the
    // index-only posture (which must fail loudly), the durable store
    // makes the safe remedy automatic — rebuild from it and continue
    val metaPath = new org.apache.hadoop.fs.Path(s"$ix/meta")
    metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(metaPath, true)
    stage(embs.filter($"vec_id" >= 200 && $"vec_id" < 260),
      s"$root/staging", "d2")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(!AnnIndex.ensure(ingest.store(), ix),
      "rebuilt-from-store index must be fresh for the grown corpus")
    assert(spark.read.parquet(s"$ix/postings").count() == 260L)
  }

  test("streaming ANN takedowns: early retract is ledger-only; no-store fails loudly") {
    import graft.streaming.StreamingDedupIngest.stage
    val root = Files.createTempDirectory("graft_stannel_").toString
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    // retract BEFORE any batch was ever ingested: the sticky ledger
    // entry IS the correct end state — not an error (ADVICE r8) —
    // and the id can never be admitted afterwards
    val ingest = new graft.streaming.StreamingAnnIngest(spark,
      s"$root/ix", storeDir = Some(s"$root/store"))
    ingest.retract(Seq(3L).toDF("vec_id"))
    assert(spark.read.parquet(s"$root/store_retracted").count() == 1L)
    stage(embs.filter($"vec_id" < 50), s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(ingest.store().filter($"vec_id" === 3L).isEmpty,
      "pre-ingest-retracted id must never be admitted")
    assert(spark.read.parquet(s"$root/ix/postings")
      .filter($"nid" === 3L).isEmpty)
    // the dedup twin honors the same early-takedown contract
    val dIngest = new graft.streaming.StreamingDedupIngest(spark,
      s"$root/dix", s"$root/corpus", s"$root/q")
    dIngest.retract(Seq(7L).toDF("doc_id"))
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    graft.streaming.StreamingDedupIngest.stage(
      docs.filter($"doc_id" < 50), s"$root/dstaging", "d1")
    dIngest.ingestAvailable(s"$root/dstaging", s"$root/dckpt")
    assert(dIngest.corpus().filter($"doc_id" === 7L).isEmpty,
      "dedup twin: pre-ingest-retracted id must never be admitted")
    // index-only posture: takedowns are impossible without the store
    // — the ingest says so loudly instead of corrupting anything
    val bare = new graft.streaming.StreamingAnnIngest(spark,
      s"$root/bare_ix")
    val e = intercept[IllegalStateException] {
      bare.retract(Seq(1L).toDF("vec_id"))
    }
    assert(e.getMessage.contains("storeDir"))
  }

  test("streaming keyword ingest (store posture): gate, takedown, " +
      "sticky re-delivery, crash windows") {
    import graft.ext.KeywordIndex
    import graft.streaming.StreamingDedupIngest.stage
    val root = Files.createTempDirectory("graft_stkw_").toString
    val (ix, store) = (s"$root/ix", s"$root/store")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val ingest = new graft.streaming.StreamingKeywordIngest(spark, ix,
      storeDir = Some(store))
    val drop1 = docs.filter($"doc_id" < 30)
    val drop2 = docs.filter($"doc_id" >= 30)
    stage(drop1, s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(ids(ingest.store()) == ids(drop1), "first drop seeds store")
    // second drop + a re-delivered slice: the gate must skip repeats
    stage(drop2.unionByName(drop1.limit(5)), s"$root/staging", "d2")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(ids(ingest.store()) == ids(docs))
    assert(!KeywordIndex.ensure(docs, ix),
      "streamed index content-fresh over the full corpus")
    // streamed serve == in-query scorer over the full corpus
    val terms = Seq("data", "query")
    def stored() = KeywordIndex.probe(spark, ix, terms, 10,
      zeroFill = true).collect().toSeq
    assert(stored() ==
      graft.ext.Relevance.bm25TopDocs(docs, terms, 10).collect().toSeq,
      "streamed keyword serve != in-query BM25")

    // takedown: purge 3 docs — store loses them, index un-mixes,
    // BM25 statistics shift to the live remainder
    val goneIds = Set(5L, 17L, 40L)
    val live = docs.filter(!$"doc_id".isin(goneIds.toSeq: _*))
      .localCheckpoint()
    ingest.retract(goneIds.toSeq.toDF("doc_id"))
    assert(ids(ingest.store()).intersect(goneIds).isEmpty,
      "retracted docs must leave the store")
    assert(!KeywordIndex.ensure(live, ix),
      "post-retract index content-fresh over the LIVE corpus")
    assert(stored() ==
      graft.ext.Relevance.bm25TopDocs(live, terms, 10).collect().toSeq,
      "post-takedown serve != in-query BM25 over survivors")
    // idempotent replay: no ledger growth
    val ledgerRows = spark.read.parquet(store + "_retracted").count()
    ingest.retract(goneIds.toSeq.toDF("doc_id"))
    assert(spark.read.parquet(store + "_retracted").count()
      == ledgerRows, "replayed takedown must not grow the ledger")
    // STICKY: compact materializes the tombstones, then re-deliver a
    // retracted id — the ledger must keep it out
    KeywordIndex.compact(spark, ix)
    stage(docs.filter($"doc_id" === 5), s"$root/staging", "redeliver5")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(!ids(ingest.store()).contains(5L),
      "re-delivered retracted doc must stay out (sticky ledger)")
    assert(spark.read.parquet(s"$ix/doclens")
      .filter($"id" === 5L).isEmpty,
      "re-delivered retracted doc must not re-enter the index")
    // crash residue: store purged but index remove never ran —
    // retract must rebuild from the purged store
    val m = classOf[graft.streaming.StreamingKeywordIngest]
      .getDeclaredMethod("purgeStore", classOf[String],
        classOf[org.apache.spark.sql.DataFrame])
    m.setAccessible(true)
    m.invoke(ingest, store,
      Seq(23L).toDF("doc_id").select($"doc_id".cast("long").as("doc_id")))
    ingest.retract(Seq(23L).toDF("doc_id"))
    assert(!ids(ingest.store()).contains(23L))
    assert(!KeywordIndex.ensure(ingest.store(), ix),
      "post-crash retract must leave a fresh index over the store")
    // crash mid-append self-heals from the store
    val metaPath = new org.apache.hadoop.fs.Path(s"$ix/meta")
    metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(metaPath, true)
    stage(docs.filter($"doc_id" === 5), s"$root/staging", "d3")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(!KeywordIndex.ensure(ingest.store(), ix),
      "rebuilt-from-store index must be fresh (and doc 5 still out)")
    // early retract on a virgin ingest is ledger-only; index-only
    // posture refuses takedowns loudly
    val ingest2 = new graft.streaming.StreamingKeywordIngest(spark,
      s"$root/ix2", storeDir = Some(s"$root/store2"))
    ingest2.retract(Seq(3L).toDF("doc_id"))
    assert(spark.read.parquet(s"$root/store2_retracted").count() == 1L)
    stage(docs.filter($"doc_id" < 10), s"$root/staging2", "d1")
    ingest2.ingestAvailable(s"$root/staging2", s"$root/ckpt2")
    assert(ingest2.store().filter($"doc_id" === 3L).isEmpty,
      "pre-ingest-retracted doc must never be admitted")
    val bare = new graft.streaming.StreamingKeywordIngest(spark,
      s"$root/bare_ix")
    val e = intercept[IllegalStateException] {
      bare.retract(Seq(1L).toDF("doc_id"))
    }
    assert(e.getMessage.contains("storeDir"))
  }

  test("streaming ANN ingest: mid-append crash replay fails loudly") {
    val ix = Files.createTempDirectory("graft_stann_cr_").toString + "/ix"
    val staging = Files.createTempDirectory("graft_stann_crs_").toString
    val ckpt = Files.createTempDirectory("graft_stann_crc_").toString
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    val tmp = Files.createTempDirectory("graft_stann_crp_")
    embs.filter($"vec_id" < 100).coalesce(1).write.parquet(s"$tmp/out")
    val part = new java.io.File(s"$tmp/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath,
      java.nio.file.Paths.get(staging, "drop1.parquet"))

    val ingest = new StreamingAnnIngest(spark, ix)
    ingest.ingestAvailable(staging, ckpt)
    assert(spark.read.parquet(s"$ix/postings").count() == 100)

    // simulate a crash INSIDE append: postings landed, meta did not
    // (append deletes meta first — the commit marker). On restart the
    // replayed batch must NOT rebuild the index from itself: that
    // would silently drop every previously ingested vector. The
    // ingest must fail loudly instead, naming the orphaned assets.
    val metaPath = new org.apache.hadoop.fs.Path(s"$ix/meta")
    metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(metaPath, true)
    embs.filter($"vec_id" >= 100 && $"vec_id" < 120).coalesce(1)
      .write.parquet(s"$tmp/out2")
    val part2 = new java.io.File(s"$tmp/out2").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part2.toPath,
      java.nio.file.Paths.get(staging, "drop2.parquet"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ingest.ingestAvailable(staging, ckpt)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists {
      case ise: IllegalStateException =>
        ise.getMessage.contains("no meta commit marker")
      case _ => false
    }, s"expected the loud corruption error, got: $e")
    // and crucially: the previously ingested postings are untouched
    assert(spark.read.parquet(s"$ix/postings").count() == 100)
  }

  test("predicate takedown: retractWhere resolves ids against the " +
      "stores, both families") {
    import graft.ext.{AnnIndex, DedupIndex}
    import graft.streaming.StreamingDedupIngest
    import graft.streaming.StreamingDedupIngest.stage
    val root = Files.createTempDirectory("graft_rw_").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    def dIds(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet

    // --- dedup family: the predicate runs over corpus AND quarantine
    val ingest = new StreamingDedupIngest(spark, s"$root/ix",
      s"$root/corpus", s"$root/q")
    // a predicate takedown BEFORE any ingest is a clean no-op: no
    // stored row can match, so there are no concrete ids to ledger
    ingest.retractWhere($"doc_id" % 10 === 3)
    assert(!new java.io.File(s"$root/corpus_retracted").exists(),
      "no-match predicate takedown must not create a ledger")
    stage(docs.filter($"doc_id" < 200), s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    // an exact dup under a doomed id: it only survives in QUARANTINE,
    // and the predicate must still find it there
    stage(docs.filter($"doc_id" === 7)
      .select(lit(9103L).as("doc_id"), $"text"), s"$root/staging", "d2")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(dIds(spark.read.parquet(s"$root/q")).contains(9103L))
    ingest.retractWhere($"doc_id" % 10 === 3)
    assert(dIds(ingest.corpus()).forall(_ % 10 != 3),
      "matching docs must leave the corpus store")
    assert(!dIds(spark.read.parquet(s"$root/q")).contains(9103L),
      "the quarantined-only copy must be found by the predicate")
    assert(!DedupIndex.ensure(ingest.corpus(), s"$root/ix"),
      "index must stay content-fresh over the purged corpus")
    // the resolved ids are ledgered like any takedown: sticky
    stage(docs.filter($"doc_id" === 3), s"$root/staging", "re3")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(!dIds(ingest.corpus()).contains(3L),
      "re-delivered predicate-retracted doc must stay out")

    // --- ANN family: store posture required, then the same contract
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    def vIds(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").as[Long].collect().toSet
    val annNoStore =
      new StreamingAnnIngest(spark, s"$root/aix0")
    intercept[IllegalStateException] {
      annNoStore.retractWhere($"vec_id" === 1L)
    }
    val ann = new StreamingAnnIngest(spark, s"$root/aix",
      storeDir = Some(s"$root/astore"))
    stage(embs.filter($"vec_id" < 200), s"$root/astaging", "a1")
    ann.ingestAvailable(s"$root/astaging", s"$root/ackpt")
    ann.retractWhere($"vec_id" % 7 === 1)
    assert(vIds(ann.store()).forall(_ % 7 != 1),
      "matching vectors must leave the store")
    val live = embs.filter($"vec_id" < 200 && $"vec_id" % 7 =!= 1)
    assert(!AnnIndex.ensure(live, s"$root/aix"),
      "ANN index must stay content-fresh over the live remainder")
  }

  test("corpus as-of: batch ledger, prefix reads, compaction identity, " +
      "crash heal") {
    import graft.streaming.StreamingDedupIngest
    import graft.streaming.StreamingDedupIngest.stage
    val root = Files.createTempDirectory("graft_asof_").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "text").as[(Long, String)].collect().toSet

    val ingest = new StreamingDedupIngest(spark, s"$root/ix",
      s"$root/corpus", s"$root/q")
    stage(docs.filter($"doc_id" < 150), s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    val cut = ingest.batchLedger().agg(max($"batch")).as[Long].head()
    val atCut = rows(ingest.corpus())

    stage(docs.filter($"doc_id" >= 150 && $"doc_id" < 260),
      s"$root/staging", "d2")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    // the as-of read is the FIRST drop's accepted corpus exactly,
    // even though a later batch has landed since
    assert(rows(ingest.corpusAsOf(cut)) == atCut)
    // the ledger accounts for every accepted row, batch-partitioned
    val ledger = ingest.batchLedger()
      .as[(Long, Long)].collect().toMap
    assert(ledger.values.sum == ingest.corpus().count())
    assert(ledger.keySet.max > cut, "second drop landed a later batch")

    // compaction on the live ingest's stores is content-neutral
    // whatever the file counts (AQE coalesces these tiny batches to
    // one file already, so this is usually a no-op)
    val before = rows(ingest.corpus())
    ingest.compactStores(maxFilesPerBatch = 1)
    assert(rows(ingest.corpus()) == before)
    assert(rows(ingest.corpusAsOf(cut)) == atCut)

    // small-file compaction proper, on a synthetically multi-file
    // store (the production shape: a micro-batch lands one file per
    // shuffle partition): every over-threshold batch dir rewrites to
    // ONE file, bit-identical content, idempotent second pass
    val mroot = s"$root/mstore"
    docs.filter($"doc_id" < 60).repartition(3)
      .write.parquet(s"$mroot/batch=0")
    docs.filter($"doc_id" >= 60 && $"doc_id" < 90).repartition(2)
      .write.parquet(s"$mroot/batch=1")
    val m = new StreamingDedupIngest(spark, s"$root/mix", mroot,
      s"$root/mq")
    val mBefore = rows(m.corpus())
    assert(m.compactStores(maxFilesPerBatch = 1) == 2,
      "both multi-file batch dirs must rewrite")
    val corpusRoot = new java.io.File(mroot)
    corpusRoot.listFiles.filter(_.getName.startsWith("batch="))
      .foreach { d =>
        assert(d.listFiles.count(_.getName.endsWith(".parquet")) == 1,
          s"${d.getName} not compacted to one file")
      }
    assert(rows(m.corpus()) == mBefore)
    // idempotent: nothing left over threshold
    assert(m.compactStores(maxFilesPerBatch = 1) == 0)

    // crash window between delete and rename: the staged dir holds
    // the batch's full content and the next reader heals it in
    val victim = corpusRoot.listFiles
      .filter(_.getName.startsWith("batch=")).head
    val staged = new java.io.File(corpusRoot,
      s".${victim.getName}.compact")
    spark.read.option("basePath", mroot)
      .parquet(victim.getPath).drop("batch").localCheckpoint()
      .coalesce(1).write.parquet(staged.getPath)
    val victimPath = new org.apache.hadoop.fs.Path(victim.getPath)
    victimPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(victimPath, true)
    assert(rows(m.corpus()) == mBefore,
      "reader must heal the crashed swap — no batch goes invisible")
    assert(!staged.exists() && victim.exists())

    // crash window before the delete: live intact, staged redundant
    val staged2 = new java.io.File(corpusRoot,
      s".${victim.getName}.compact")
    spark.read.option("basePath", mroot)
      .parquet(victim.getPath).drop("batch").localCheckpoint()
      .coalesce(1).write.parquet(staged2.getPath)
    assert(rows(m.corpus()) == mBefore)
    assert(!staged2.exists(), "redundant staged copy must be dropped")
  }

  test("ANN store as-of mirrors the corpus contract (store posture)") {
    import graft.streaming.StreamingDedupIngest.stage
    val root = Files.createTempDirectory("graft_vasof_").toString
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    def vIds(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").as[Long].collect().toSet

    val ann = new StreamingAnnIngest(spark, s"$root/ix",
      storeDir = Some(s"$root/store"))
    val drop1 = embs.filter($"vec_id" < 120)
    stage(drop1, s"$root/staging", "a1")
    ann.ingestAvailable(s"$root/staging", s"$root/ckpt")
    val cut = ann.batchLedger().agg(max($"batch")).as[Long].head()
    stage(embs.filter($"vec_id" >= 120 && $"vec_id" < 240),
      s"$root/staging", "a2")
    ann.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(vIds(ann.storeAsOf(cut)) == vIds(drop1))
    assert(vIds(ann.store()).size > vIds(drop1).size)
    // delta = exactly the second drop; asOf ∪ delta = the full store
    val hi = ann.batchLedger().agg(max($"batch")).as[Long].head()
    assert(vIds(ann.storeDelta(cut, hi)) ==
      vIds(ann.store()) -- vIds(drop1))
    // compaction preserves both reads
    val full = vIds(ann.store())
    ann.compactStores(maxFilesPerBatch = 1)
    assert(vIds(ann.store()) == full)
    assert(vIds(ann.storeAsOf(cut)) == vIds(drop1))
  }

  test("seeded bootstrap: streamed drops gate against the seed corpus") {
    import graft.ext.{AnnIndex, DedupIndex}
    import graft.streaming.StreamingDedupIngest
    import graft.streaming.StreamingDedupIngest.stage
    val root = Files.createTempDirectory("graft_seed_").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    def dIds(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet

    val ingest = new StreamingDedupIngest(spark, s"$root/ix",
      s"$root/corpus", s"$root/q")
    val seedDocs = docs.filter($"doc_id" < 200)
    ingest.seed(seedDocs)
    assert(dIds(ingest.corpus()) == dIds(seedDocs))
    assert(!DedupIndex.ensure(ingest.corpus(), s"$root/ix"),
      "seeded index must be content-fresh over the seed corpus")
    // re-seeding or seeding under an existing corpus refuses
    intercept[IllegalArgumentException] { ingest.seed(seedDocs) }

    // the first streamed drop gates against the SEED: an exact dup
    // of a seeded doc quarantines, the new docs land
    val dupOfSeed = docs.filter($"doc_id" === 3)
      .select(lit(9201L).as("doc_id"), $"text")
    val drop = docs.filter($"doc_id" >= 200 && $"doc_id" < 300)
    stage(drop.unionByName(dupOfSeed), s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(dIds(spark.read.parquet(s"$root/q")).contains(9201L),
      "near-dup of a seeded doc must quarantine")
    assert(dIds(ingest.corpus()).contains(200L))
    // the seed is batch -1: as-of below the first streamed batch
    // serves it alone, and the delta to the head is the drop
    assert(dIds(ingest.corpusAsOf(-1L)) == dIds(seedDocs))
    val hi = ingest.batchLedger().agg(max($"batch")).as[Long].head()
    assert(dIds(ingest.corpusDelta(-1L, hi)) ==
      dIds(ingest.corpus()) -- dIds(seedDocs))

    // ANN family: same bootstrap contract under the store posture
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    def vIds(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").as[Long].collect().toSet
    val ann = new StreamingAnnIngest(spark, s"$root/aix",
      storeDir = Some(s"$root/astore"))
    val seedVecs = embs.filter($"vec_id" < 150)
    ann.seed(seedVecs)
    assert(vIds(ann.store()) == vIds(seedVecs))
    // a drop that re-delivers seeded ids appends only the new ones
    stage(embs.filter($"vec_id" < 250), s"$root/astaging", "a1")
    ann.ingestAvailable(s"$root/astaging", s"$root/ackpt")
    assert(vIds(ann.store()) == vIds(embs.filter($"vec_id" < 250)))
    assert(!AnnIndex.ensure(ann.store(), s"$root/aix"),
      "streamed-over-seed index must be content-fresh")
    assert(vIds(ann.storeAsOf(-1L)) == vIds(seedVecs))
  }

  test("admission gate: rejects quarantine un-indexed; readmit " +
      "overrides; re-delivery never re-quarantines an accepted doc") {
    import graft.ext.{DedupIndex, TextAnalysis}
    import graft.streaming.StreamingDedupIngest
    import graft.streaming.StreamingDedupIngest.stage
    val root = Files.createTempDirectory("graft_admit_").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    def dIds(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val q = TextAnalysis.qualityScore($"text")
    val slice = docs.filter($"doc_id" < 200)
    val rejectIds = dIds(slice.filter(!(q >= 0.5)))
    assert(rejectIds.nonEmpty, "fixture must carry low-quality docs")

    val ingest = new StreamingDedupIngest(spark, s"$root/ix",
      s"$root/corpus", s"$root/q", admit = Some(q >= 0.5))
    stage(slice, s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    // first batch: quarantine = exactly the quality rejects (the
    // near-dup gate has nothing to collide with yet), corpus and
    // index = the admitted remainder
    assert(dIds(spark.read.parquet(s"$root/q")) == rejectIds)
    assert(dIds(ingest.corpus()) == dIds(slice) -- rejectIds)
    assert(dIds(DedupIndex.liveIndexedIds(spark, s"$root/ix")
      .withColumnRenamed("id", "doc_id")) == dIds(slice) -- rejectIds)

    // second drop: rejects and near-dups share the quarantine; an
    // exact copy of an accepted doc quarantines as a near-dup
    val acceptedId = (dIds(slice) -- rejectIds).min
    val copy = docs.filter($"doc_id" === acceptedId)
      .select(lit(7001L).as("doc_id"), $"text")
    val d2 = docs.filter($"doc_id" >= 200 && $"doc_id" < 300)
      .unionByName(copy)
    val rejects2 = dIds(d2.filter(!(q >= 0.5)))
    stage(d2, s"$root/staging", "d2")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    val quar2 = dIds(spark.read.parquet(s"$root/q"))
    assert(quar2.contains(7001L), "near-dup must still quarantine")
    assert(rejects2.subsetOf(quar2), "quality rejects must quarantine")
    assert((dIds(ingest.corpus()) & rejects2).isEmpty)

    // readmit overrides the quality verdict (the human-review path)
    val one = rejectIds.min
    ingest.readmit(spark.range(1).select(lit(one).as("doc_id")))
    assert(dIds(ingest.corpus()).contains(one))
    assert(!dIds(spark.read.parquet(s"$root/q")).contains(one))
    // re-delivery of the original drop: the readmitted doc is
    // already indexed, so the re-delivery gate drops it BEFORE the
    // admission predicate — it must NOT be re-quarantined, and the
    // corpus must be unchanged
    val corpusBefore = dIds(ingest.corpus())
    stage(slice, s"$root/staging", "d3")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(dIds(ingest.corpus()) == corpusBefore)
    assert(dIds(ingest.corpus()).contains(one),
      "re-delivery must not evict a readmitted doc")
    val quarByBatch = spark.read.parquet(s"$root/q")
      .filter($"doc_id" === one)
    assert(quarByBatch.isEmpty,
      "re-delivered readmitted doc must not re-quarantine")

    // NULL verdicts reject instead of vanishing: with a predicate
    // that is genuinely NULL on null text (length(text) >= 10 —
    // unlike qualityScore, whose fused stats are null-safe), the
    // null-text doc lands in quarantine, not in the corpus and not
    // dropped from both splits
    val nroot = Files.createTempDirectory("graft_admitn_").toString
    val ningest = new StreamingDedupIngest(spark, s"$nroot/ix",
      s"$nroot/corpus", s"$nroot/q",
      admit = Some(length($"text") >= 10))
    stage(docs.filter($"doc_id" < 5).unionByName(
        spark.range(1).select(lit(7100L).as("doc_id"),
          lit(null).cast("string").as("text"))),
      s"$nroot/staging", "d1")
    ningest.ingestAvailable(s"$nroot/staging", s"$nroot/ckpt")
    assert(dIds(spark.read.parquet(s"$nroot/q")) == Set(7100L))
    assert(dIds(ningest.corpus()) == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("readmit: refusals, re-delivery immunity, and as-of placement") {
    import graft.ext.DedupIndex
    import graft.streaming.StreamingDedupIngest
    import graft.streaming.StreamingDedupIngest.stage
    val root = Files.createTempDirectory("graft_readm_").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    def dIds(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet

    val ingest = new StreamingDedupIngest(spark, s"$root/ix",
      s"$root/corpus", s"$root/q")
    val seedDocs = docs.filter($"doc_id" < 100)
    ingest.seed(seedDocs)
    // exact copies of seeded docs under fresh ids: quarantined
    val dupDrop = docs.filter($"doc_id" < 40)
      .select(($"doc_id" + 5000L).as("doc_id"), $"text")
    stage(dupDrop, s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    assert(dIds(spark.read.parquet(s"$root/q")) == dIds(dupDrop))
    val quarBatch = spark.read.parquet(s"$root/q")
      .select($"batch".cast("long")).as[Long].head()

    // refusal: an id that is not quarantined (accepted, or never seen)
    intercept[IllegalArgumentException] {
      ingest.readmit(spark.range(1).select(lit(3L).as("doc_id")))
    }
    intercept[IllegalArgumentException] {
      ingest.readmit(spark.range(1).select(lit(999999L).as("doc_id")))
    }
    // refusal: a retraction-ledgered id stays out (sticky compliance)
    ingest.retract(spark.range(1).select(lit(5007L).as("doc_id")))
    intercept[IllegalArgumentException] {
      ingest.readmit(spark.range(1).select(lit(5007L).as("doc_id")))
    }

    // the readmit: evens move to the corpus IN THE QUARANTINED BATCH
    // (corrected history), index maintained incrementally
    val evens = dupDrop.filter($"doc_id" % 2 === 0).select("doc_id")
    ingest.readmit(evens)
    assert(dIds(ingest.corpus()) == dIds(seedDocs) ++ dIds(evens))
    assert(dIds(ingest.corpusAsOf(quarBatch)) ==
      dIds(seedDocs) ++ dIds(evens),
      "readmitted docs join their original batch in as-of reads")
    assert(dIds(spark.read.parquet(s"$root/q")) ==
      dIds(dupDrop) -- dIds(evens) - 5007L)
    assert(!DedupIndex.ensure(ingest.corpus(), s"$root/ix"),
      "index must be content-fresh after readmit, no rebuild")

    // re-delivery immunity: the same drop replayed through a fresh
    // staging lands nothing new — readmitted ids are indexed (bloom
    // skip), the rest re-quarantine idempotently
    val before = dIds(ingest.corpus())
    stage(dupDrop, s"$root/staging2", "d1")
    ingest.ingestAvailable(s"$root/staging2", s"$root/ckpt2")
    assert(dIds(ingest.corpus()) == before,
      "re-delivered readmitted docs must not duplicate")

    // idempotent re-run convergence: readmit the same (now-empty)
    // request fails the not-quarantined refusal — but a crash BETWEEN
    // corpus write and quarantine purge re-runs cleanly: simulate by
    // re-inserting the quarantine rows for the evens and re-running
    val evenRows = dupDrop.join(evens, Seq("doc_id"), "left_semi")
    val withCrash = spark.read.option("basePath", s"$root/q")
      .parquet(s"$root/q/batch=$quarBatch").select("doc_id", "text")
      .unionByName(evenRows).localCheckpoint()
    withCrash.write.mode("overwrite")
      .parquet(s"$root/q/batch=$quarBatch")
    ingest.readmit(evens)
    assert(dIds(ingest.corpus()) == before,
      "re-run after simulated crash converges, no duplicates")
    assert(dIds(spark.read.parquet(s"$root/q")) ==
      dIds(dupDrop) -- dIds(evens) - 5007L,
      "re-run purges only the readmitted ids from quarantine")
    assert(!DedupIndex.ensure(ingest.corpus(), s"$root/ix"))

    // predicate form: resolves against the quarantine store only
    val wantWhere = (dIds(dupDrop) -- dIds(evens) - 5007L)
      .filter(_ % 10 == 1)
    assert(wantWhere.nonEmpty)
    ingest.readmitWhere($"doc_id" % 10 === 1)
    assert(dIds(ingest.corpus()) == before ++ wantWhere)
    assert(dIds(spark.read.parquet(s"$root/q")) ==
      dIds(dupDrop) -- dIds(evens) - 5007L -- wantWhere)
    // nothing left matching: a repeat is a no-op, not a refusal
    ingest.readmitWhere($"doc_id" % 10 === 1)
    assert(dIds(ingest.corpus()) == before ++ wantWhere)
    assert(!DedupIndex.ensure(ingest.corpus(), s"$root/ix"))
  }

  test("serve-while-rebuilding maintenance: rebuildIndex and retrain") {
    import graft.ext.{AnnIndex, DedupIndex}
    import graft.streaming.StreamingDedupIngest
    import graft.streaming.StreamingDedupIngest.stage
    val root = Files.createTempDirectory("graft_retrn_").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").localCheckpoint()

    val ingest = new StreamingDedupIngest(spark, s"$root/ix",
      s"$root/corpus", s"$root/q")
    stage(docs.filter($"doc_id" < 200), s"$root/staging", "d1")
    ingest.ingestAvailable(s"$root/staging", s"$root/ckpt")
    ingest.retract(docs.filter($"doc_id" < 30).select("doc_id"))
    ingest.rebuildIndex()
    val h = DedupIndex.health(spark, s"$root/ix")
      .as[(String, Double)].collect().toMap
    assert(h("n_tombstoned") == 0 &&
      h("n_bucket_rows") == h("n_buckets"),
      "rebuildIndex folds accretion and materializes tombstones")
    assert(!DedupIndex.ensure(ingest.corpus(), s"$root/ix"))

    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    val ann = new StreamingAnnIngest(spark, s"$root/aix",
      storeDir = Some(s"$root/astore"))
    stage(embs.filter($"vec_id" < 200), s"$root/astaging", "a1")
    ann.ingestAvailable(s"$root/astaging", s"$root/ackpt")
    ann.retract(embs.filter($"vec_id" % 7 === 2 && $"vec_id" < 200)
      .select("vec_id"))
    ann.retrain()
    val ah = AnnIndex.health(spark, s"$root/aix")
      .as[(String, Double)].collect().toMap
    assert(ah("n_tombstoned") == 0 && ah("n_postings") == ah("n_live"),
      "retrain rebuilds clean over the live store")
    assert(!AnnIndex.ensure(ann.store(), s"$root/aix"),
      "retrained index content-fresh over the live vector store")

    // ingest-level health: index frame + store gauges in one report
    val ih = ann.health().as[(String, Double)].collect().toMap
    assert(ih("store_rows") == ih("n_live"),
      "retrained index serves exactly the durable store")
    assert(ih("store_batches") == 1d && ih("retracted_ids") ==
      embs.filter($"vec_id" % 7 === 2 && $"vec_id" < 200).count()
        .toDouble)
  }
}
