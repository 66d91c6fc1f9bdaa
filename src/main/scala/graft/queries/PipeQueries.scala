package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ext.{Chunking, Curation, Dedup, Drift, Similarity, TextAnalysis}
import graft.ops.{DeltaAgg, Expectations, Scd2, TopKAgg}
import graft.streaming.StreamingOps

/** Pipeline-lifecycle queries: SCD2 dimension versioning (u*), the
  * chunk/shuffle corpus-prep steps (c*), and the held-out split
  * assignment (e*) — the operators that turn the engine's cleaned
  * corpus into training-ready inputs and keep its dimensions
  * queryable "as of" any point in time. Same contract as the other
  * registries: every query has a DuckDB oracle producing the
  * identical result.
  */
object PipeQueries {
  import Q._

  // oracle-side twin of TextAnalysis.fingerprint (same literal as
  // ExtQueries uses for the d-family)
  private val SqlFp = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"

  val all: Seq[Q] = Seq(

    // ---- SCD2 dimension versioning ------------------------------------

    // Rebuild the full per-user event_type history from the events
    // change log: consecutive repeats compressed, each surviving row
    // versioned [valid_from, valid_to). One shuffle on user_id; both
    // window passes share the (user_id; ts, event_id) sort.
    Q("u1_scd2_rebuild",
      (s, dir) => Scd2
        .fromLog(t(s, dir, "events"), key = "user_id", tsCol = "ts",
          attr = "event_type", tieCol = "event_id")
        .orderBy(col("user_id"), col("valid_from"), col("event_type"),
          asc_nulls_first("valid_to")),
      Some("""WITH ordered AS (
                SELECT user_id, ts, event_type, event_id,
                       LAG(event_type) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                FROM events),
              changes AS (
                SELECT user_id, event_type, ts, event_id FROM ordered
                WHERE prev IS NULL OR prev <> event_type)
              SELECT user_id, event_type, ts AS valid_from,
                     LEAD(ts) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
              FROM changes
              ORDER BY user_id, valid_from, event_type,
                       valid_to NULLS FIRST""")),

    // MERGE an update batch into a current snapshot: customers with a
    // negative balance move to segment DELINQUENT effective Feb 1 —
    // their open row closes out and a new open row appends; everyone
    // else passes through. Snapshot never shuffles (batch broadcast).
    Q("u2_scd2_merge",
      (s, dir) => {
        val cur = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            ts("2024-01-01 00:00:00").as("valid_from"))
        val upd = t(s, dir, "customer").filter(col("c_acctbal") < 0)
          .select(col("c_custkey"), lit("DELINQUENT").as("c_mktsegment"))
        Scd2.applyChanges(cur, upd, key = "c_custkey",
            attr = "c_mktsegment", effTs = ts("2024-02-01 00:00:00"))
          .orderBy(col("c_custkey"), col("valid_from"))
      },
      Some("""WITH cur AS (
                SELECT c_custkey, c_mktsegment,
                       TIMESTAMP '2024-01-01 00:00:00' AS valid_from
                FROM customer),
              changed AS (
                SELECT c_custkey, c_mktsegment, valid_from
                FROM cur WHERE c_custkey IN
                  (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
                  AND c_mktsegment <> 'DELINQUENT')
              SELECT c_custkey, c_mktsegment, valid_from,
                     CAST(NULL AS TIMESTAMP) AS valid_to
              FROM cur
              WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
              UNION ALL
              SELECT c_custkey, c_mktsegment, valid_from,
                     TIMESTAMP '2024-02-01 00:00:00' AS valid_to
              FROM changed
              UNION ALL
              SELECT c_custkey, 'DELINQUENT' AS c_mktsegment,
                     TIMESTAMP '2024-02-01 00:00:00' AS valid_from,
                     CAST(NULL AS TIMESTAMP) AS valid_to
              FROM changed
              ORDER BY c_custkey, valid_from""")),

    // ---- context-window prep ------------------------------------------

    // Overlapping token windows (size 64, overlap 16): narrow
    // map+explode, no shuffle — chunking rides the scan partitioning.
    Q("c4_chunk_docs",
      (s, dir) => Chunking.chunk(t(s, dir, "documents"),
          size = 64, overlap = 16)
        .orderBy(col("doc_id"), col("chunk_id")),
      Some("""WITH toks AS (
                SELECT doc_id, string_split_regex(text, '\s+') AS tk
                FROM documents),
              base AS (
                SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0),
              starts AS (
                SELECT doc_id, tk, n,
                       unnest(generate_series(0, GREATEST(n - 17, 0), 48))
                         AS s
                FROM base)
              SELECT doc_id, s // 48 AS chunk_id,
                     array_to_string(list_slice(tk, s + 1, s + 64), ' ')
                       AS chunk_text,
                     CAST(LEAST(64, n - s) AS BIGINT) AS n_chunk_tokens
              FROM starts ORDER BY doc_id, chunk_id""")),

    // Deterministic epoch shuffle: reproducible pseudorandom
    // permutation by md5(key:epoch), executed as a range-partitioned
    // sort — no RNG state, no single-partition window.
    Q("c5_epoch_shuffle",
      (s, dir) => Curation.epochShuffle(
        t(s, dir, "documents").select(col("doc_id")), "doc_id", epoch = 1),
      Some("""SELECT doc_id,
                     md5(CAST(doc_id AS VARCHAR) || ':1') AS shuffle_key
              FROM documents ORDER BY shuffle_key, doc_id""")),

    // ---- bloom-prefiltered incremental dedup --------------------------

    // Same exact-result contract as d7 (bloom prefilter + exact
    // verify = exact; no false negatives), on a different batch mix
    // (1/3 re-ingested duplicates, 2/3 genuinely new): the oracle is
    // the plain exact-incremental SQL, so a filter bug — a missed
    // duplicate let through or a new doc wrongly dropped — hash-fails.
    Q("d10_dedup_bloom",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val dups = docs.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            upper(col("text")).as("text"))
        val fresh = docs.filter(col("doc_id") % 3 =!= 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" b2")).as("text"))
        // filter sized to the fixture corpus (≤50 k docs at sf1synth):
        // 2^17 bits ≈ 16 KiB — the broadcast artifact stays literal-
        // sized in the plan; production corpora scale numBits up
        Dedup.bloomIncrementalDedup(dups.unionByName(fresh), docs,
            expectedItems = 50000L, numBits = 1L << 17)
          .select(col("doc_id"),
            TextAnalysis.fingerprint(col("text")).as("fp"))
          .orderBy("doc_id")
      },
      Some(s"""WITH corpus_fp AS (SELECT $SqlFp AS fp FROM documents),
               b AS (
                 SELECT doc_id + 2000000 AS doc_id, upper(text) AS text
                 FROM documents WHERE doc_id % 3 = 0
                 UNION ALL
                 SELECT doc_id + 2000000 AS doc_id, text || ' b2' AS text
                 FROM documents WHERE doc_id % 3 <> 0),
               bf AS (SELECT doc_id, $SqlFp AS fp FROM b),
               surv AS (SELECT doc_id, fp FROM (
                          SELECT doc_id, fp,
                                 ROW_NUMBER() OVER (PARTITION BY fp
                                                    ORDER BY doc_id) AS rn
                          FROM bf) WHERE rn = 1)
               SELECT s.doc_id, s.fp FROM surv s
               WHERE NOT EXISTS (SELECT 1 FROM corpus_fp c
                                 WHERE c.fp = s.fp)
               ORDER BY s.doc_id""")),

    // ---- stream-static enrichment -------------------------------------

    // Event stream × broadcast customer dimension, aggregated per
    // segment in complete mode — the finite replay equals the batch
    // join+group the oracle runs.
    Q("st8_stream_static_enrich",
      (s, dir) => StreamingOps.streamStaticEnrich(s, dir),
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_events,
                      ${sqlSum("value")} AS sum_value
               FROM events JOIN customer ON user_id = c_custkey
               GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- data-quality expectations ------------------------------------

    // The admission gate as one report: five row-local rules fused
    // into a single scan-stage aggregate, plus key-uniqueness and FK
    // existence — every check one bounded row, union ordered by rule.
    Q("e7_expectations",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        Expectations.report(Seq(
          Expectations.rowChecks(li, Seq(
            "discount_range" -> (col("l_discount") >= 0 && col("l_discount") <= 1),
            "flag_domain" -> col("l_returnflag").isin("A", "N", "R"),
            "price_nonneg" -> (col("l_extendedprice") >= 0),
            "qty_range" -> (col("l_quantity") >= 1 && col("l_quantity") <= 50),
            "shipdate_notnull" -> col("l_shipdate").isNotNull)),
          Expectations.uniquenessCheck(li, "pk_unique",
            Seq("l_orderkey", "l_linenumber")),
          Expectations.referentialCheck(li, "l_orderkey",
            t(s, dir, "orders"), "o_orderkey", "fk_orders")))
      },
      Some("""WITH base AS (SELECT COUNT(*) AS n FROM lineitem)
              SELECT * FROM (
                SELECT 'discount_range' AS rule, n AS n_checked,
                       (SELECT COUNT(*) FROM lineitem
                        WHERE (l_discount >= 0 AND l_discount <= 1)
                          IS NOT TRUE) AS n_violations FROM base
                UNION ALL
                SELECT 'flag_domain', n,
                       (SELECT COUNT(*) FROM lineitem
                        WHERE (l_returnflag IN ('A','N','R')) IS NOT TRUE)
                  FROM base
                UNION ALL
                SELECT 'price_nonneg', n,
                       (SELECT COUNT(*) FROM lineitem
                        WHERE (l_extendedprice >= 0) IS NOT TRUE) FROM base
                UNION ALL
                SELECT 'qty_range', n,
                       (SELECT COUNT(*) FROM lineitem
                        WHERE (l_quantity >= 1 AND l_quantity <= 50)
                          IS NOT TRUE) FROM base
                UNION ALL
                SELECT 'shipdate_notnull', n,
                       (SELECT COUNT(*) FROM lineitem
                        WHERE (l_shipdate IS NOT NULL) IS NOT TRUE) FROM base
                UNION ALL
                SELECT 'pk_unique', n,
                       n - (SELECT COUNT(DISTINCT (l_orderkey, l_linenumber))
                            FROM lineitem) FROM base
                UNION ALL
                SELECT 'fk_orders', n,
                       (SELECT COUNT(*) FROM lineitem l
                        WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
                          (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey)) FROM base)
              ORDER BY rule""")),

    // ---- CDC + incremental gold maintenance ---------------------------

    // Snapshot diff: customers vs a mutated "next week" snapshot —
    // negative balances switch segment (changed), odd high keys leave
    // (removed), synthetic keys arrive (added). Sides reduce to
    // (key, md5) before the full-outer join.
    Q("u3_snapshot_diff",
      (s, dir) => {
        val before = t(s, dir, "customer")
        val after = before
          .filter(!(col("c_custkey") % 7 === 3 && col("c_custkey") > 1000))
          .withColumn("c_mktsegment",
            when(col("c_acctbal") < 0, lit("DELINQUENT"))
              .otherwise(col("c_mktsegment")))
          .unionByName(before.filter(col("c_custkey") % 11 === 5)
            .select((col("c_custkey") + 1000000L).as("c_custkey"),
              col("c_name"), col("c_nationkey"), col("c_acctbal"),
              col("c_mktsegment")))
        Scd2.snapshotDiff(before, after, "c_custkey",
            Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
          .orderBy("c_custkey", "change")
      },
      Some("""WITH after AS (
                SELECT c_custkey, c_name, c_nationkey, c_acctbal,
                       CASE WHEN c_acctbal < 0 THEN 'DELINQUENT'
                            ELSE c_mktsegment END AS c_mktsegment
                FROM customer
                WHERE NOT (c_custkey % 7 = 3 AND c_custkey > 1000)
                UNION ALL
                SELECT c_custkey + 1000000, c_name, c_nationkey,
                       c_acctbal, c_mktsegment
                FROM customer WHERE c_custkey % 11 = 5)
              SELECT COALESCE(b.c_custkey, a.c_custkey) AS c_custkey,
                     CASE WHEN b.c_custkey IS NULL THEN 'added'
                          WHEN a.c_custkey IS NULL THEN 'removed'
                          WHEN b.c_name <> a.c_name
                            OR b.c_nationkey <> a.c_nationkey
                            OR b.c_acctbal <> a.c_acctbal
                            OR b.c_mktsegment <> a.c_mktsegment
                            THEN 'changed' END AS change
              FROM customer b FULL OUTER JOIN after a
                ON b.c_custkey = a.c_custkey
              WHERE (b.c_custkey IS NULL OR a.c_custkey IS NULL
                     OR b.c_name <> a.c_name
                     OR b.c_nationkey <> a.c_nationkey
                     OR b.c_acctbal <> a.c_acctbal
                     OR b.c_mktsegment <> a.c_mktsegment)
              ORDER BY c_custkey, change""")),

    // Point-in-time (AS OF) read over the u1-built version table: the
    // one version per user valid at the probe instant — the read side
    // SCD2 exists to serve. The oracle chains u1's version SQL into
    // the same half-open-interval filter.
    Q("u4_scd2_asof",
      (s, dir) => Scd2.asOf(
          Scd2.fromLog(t(s, dir, "events"), key = "user_id", tsCol = "ts",
            attr = "event_type", tieCol = "event_id"),
          lit("2024-01-15 12:00:00").cast("timestamp"))
        .orderBy("user_id"),
      Some("""WITH ordered AS (
                SELECT user_id, ts, event_type, event_id,
                       LAG(event_type) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                FROM events),
              changes AS (
                SELECT user_id, event_type, ts, event_id FROM ordered
                WHERE prev IS NULL OR prev <> event_type),
              versions AS (
                SELECT user_id, event_type, ts AS valid_from,
                       LEAD(ts) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                         AS valid_to
                FROM changes)
              SELECT user_id, event_type,
                     CAST(valid_from AS TIMESTAMP) AS valid_from,
                     CAST(valid_to AS TIMESTAMP) AS valid_to
              FROM versions
              WHERE valid_from <= TIMESTAMP '2024-01-15 12:00:00'
                AND (valid_to IS NULL
                     OR valid_to > TIMESTAMP '2024-01-15 12:00:00')
              ORDER BY user_id""")),

    // Incremental gold maintenance: per-segment order metrics built
    // by aggregating TWO disjoint halves separately and merging the
    // monoid state — the oracle computes the one-shot aggregate, so a
    // hash match PROVES batch boundaries cannot change the result
    // (exact decimal sums merge associatively; rounding only at read).
    Q("g2_gold_incremental",
      (s, dir) => {
        val cust = broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")))
        val orders = t(s, dir, "orders")
          .join(cust, col("o_custkey") === col("c_custkey"))
        def half(even: Boolean) = DeltaAgg.partialSums(
          orders.filter((col("o_orderkey") % 2 === 0) === even),
          Seq("c_mktsegment"), col("o_totalprice"))
        val merged = DeltaAgg.merge(half(even = true), half(even = false),
          Seq("c_mktsegment"))
        DeltaAgg.finish(merged, Seq("c_mktsegment"))
          .withColumnRenamed("n", "n_orders")
          .withColumnRenamed("total", "revenue")
          .withColumnRenamed("avg", "avg_order")
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
                      ${sqlSum("o_totalprice")} AS revenue,
                      ${sqlAvg("o_totalprice")} AS avg_order
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- distribution drift ------------------------------------------

    // PSI between the full corpus and a language-skewed candidate
    // batch over 100-char length bins: both sides reduce to bounded
    // (bin, share) tables; the only shuffles are bin-keyed.
    Q("e8_drift_psi",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Drift.psiBinned(docs, docs.filter(col("lang") === "en"),
          metric = col("n_chars"), width = 100)
      },
      Some(s"""WITH pr AS (SELECT (n_chars - ((n_chars % 100 + 100) % 100))
                                  AS bin, COUNT(*) AS n
                           FROM documents GROUP BY 1),
                    pt AS (SELECT SUM(n) AS t FROM pr),
                    p AS (SELECT bin, CAST(n AS DOUBLE) / CAST(t AS DOUBLE)
                            AS pre FROM pr CROSS JOIN pt),
                    qr AS (SELECT (n_chars - ((n_chars % 100 + 100) % 100))
                                  AS bin, COUNT(*) AS n
                           FROM documents WHERE lang = 'en' GROUP BY 1),
                    qt AS (SELECT SUM(n) AS t FROM qr),
                    q AS (SELECT bin, CAST(n AS DOUBLE) / CAST(t AS DOUBLE)
                            AS pca FROM qr CROSS JOIN qt)
               SELECT bin,
                      ${sqlRoundDet("COALESCE(pre, 0)", 6)} AS p_ref,
                      ${sqlRoundDet("COALESCE(pca, 0)", 6)} AS p_cand,
                      ${sqlRoundDet(
                        """(GREATEST(COALESCE(pre, 0), 1e-4)
                            - GREATEST(COALESCE(pca, 0), 1e-4))
                           * ln(GREATEST(COALESCE(pre, 0), 1e-4)
                                / GREATEST(COALESCE(pca, 0), 1e-4))""", 4)}
                        AS psi_term
               FROM p FULL OUTER JOIN q USING (bin)
               ORDER BY bin""")),

    // ---- quantized search quality -------------------------------------

    // Recall of int8-quantized search vs the exact top-5 (asymmetric:
    // queries stay exact, corpus vectors are dequantized codes — the
    // standard ADC setup). Closes the x4 → x1 loop: x4 proves the
    // per-element reconstruction error bound, this proves the thing a
    // user cares about — how many true neighbors the compressed
    // corpus still returns. Whole chain deterministic (floor half-up
    // codes, fixed-order cosine), so SQL replays it exactly.
    Q("x5_quantized_recall",
      (s, dir) => {
        val embs = t(s, dir, "embeddings")
        val v = col("embedding").cast("array<double>")
        // mn/mx hoisted into their own projection (the
        // Similarity.quantize discipline): referenced from inside
        // the transform lambda they are re-evaluated per ELEMENT —
        // O(d²) per corpus row, measured 28× slower at d=64
        val (mn, mx) = (col("__mn"), col("__mx"))
        val scale = (mx - mn) / 255.0
        val deq = transform(col("nvec"), x => when(mx === mn, mn)
          .otherwise(
            mn + floor((x - mn) / (mx - mn) * 255.0 + 0.5) * scale))
        // ONE corpus x queries pass scoring BOTH representations,
        // then a bounded top-k AGGREGATE per
        // ranking instead of rank windows: TopKAgg keeps <=5
        // (score desc, id asc) candidates map-side, so the only
        // post-join shuffle moves <= 2*5*|queries| rows per input
        // partition and no task ever sorts a per-qid candidate set
        // (the window form's hot partition — and its measured
        // super-linear leg in SCALING.md). Both rankings live in the
        // same aggregate row, so recall is an array intersection —
        // no exact-vs-quant join at all. Ordering is total (score
        // desc, id asc — TopKAgg's contract), so the result matches
        // the oracle's ROW_NUMBER ranking exactly.
        // the repartition is the bnlj-deferred-derivation barrier:
        // without it, codegen defers the dvec transform into the
        // broadcast-join loop and dequantization re-runs per
        // (corpus row × query) PAIR — PlanGuard's rule (born from
        // x7's 41 s version of the same bug) flagged this plan's
        // own scaladoc claim that dvec ran once per row
        val c = embs
          .select(col("vec_id").as("nid"), v.as("nvec"),
            array_min(v).as("__mn"), array_max(v).as("__mx"))
          .select(col("nid"), col("nvec"), deq.as("dvec"))
          .repartition(col("nid"))
        val q = embs.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), v.as("qvec"))
        // the fused codegen CosineSimilarity — the interpreted HOF
        // dot here would evaluate per pair per array element outside
        // whole-stage codegen (the r2 ivfAssign regression pattern)
        def cosine(a: Column, b: Column): Column =
          graft.ops.Ops.roundDet(Similarity.cosine(a, b), 4)
        def ids(a: Column): Column = transform(a, x => x.getField("id"))
        c.join(broadcast(q), col("qid") =!= col("nid"))
          .select(col("qid"), col("nid"),
            cosine(col("qvec"), col("nvec")).as("ce"),
            cosine(col("qvec"), col("dvec")).as("cq"))
          .groupBy(col("qid"))
          .agg(TopKAgg.topK(5)(col("ce"), col("nid")).as("te"),
               TopKAgg.topK(5)(col("cq"), col("nid")).as("tq"))
          .agg(
            count(lit(1)).as("n_queries"),
            sum(size(col("te"))).as("__n_exact"),
            sum(size(array_intersect(ids(col("te")), ids(col("tq")))))
              .as("__n_hits"))
          .select(col("n_queries"),
            graft.ops.Ops.roundDet(
              col("__n_hits").cast("double") / col("__n_exact"), 4)
              .as("recall"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid,
                        CAST(embedding AS DOUBLE[]) AS qvec
                      FROM embeddings WHERE vec_id < 20),
               c AS (SELECT vec_id AS nid,
                       CAST(embedding AS DOUBLE[]) AS nvec
                     FROM embeddings),
               cd AS (SELECT nid,
                        CASE WHEN list_max(nvec) = list_min(nvec)
                          THEN list_transform(nvec, x -> list_min(nvec))
                          ELSE list_transform(nvec, x ->
                            list_min(nvec)
                            + floor((x - list_min(nvec))
                                    / (list_max(nvec) - list_min(nvec))
                                    * 255.0 + 0.5)
                              * ((list_max(nvec) - list_min(nvec))
                                 / 255.0))
                        END AS dvec
                      FROM c),
               er AS (SELECT qid, nid, ROW_NUMBER() OVER (
                        PARTITION BY qid ORDER BY
                          ${sqlRoundDet(
                            """list_dot_product(qvec, nvec)
                               / (sqrt(list_dot_product(qvec, qvec))
                                  * sqrt(list_dot_product(nvec, nvec)))""",
                            4)} DESC, nid) AS rank
                      FROM q, c WHERE qid <> nid),
               qr AS (SELECT qid, nid, ROW_NUMBER() OVER (
                        PARTITION BY qid ORDER BY
                          ${sqlRoundDet(
                            """list_dot_product(qvec, dvec)
                               / (sqrt(list_dot_product(qvec, qvec))
                                  * sqrt(list_dot_product(dvec, dvec)))""",
                            4)} DESC, nid) AS rank
                      FROM q JOIN cd ON qid <> nid),
               hits AS (SELECT COUNT(*) AS n_hits
                        FROM (SELECT qid, nid FROM er WHERE rank <= 5) e
                        JOIN (SELECT qid, nid FROM qr WHERE rank <= 5) s
                          USING (qid, nid)),
               tot AS (SELECT CAST(COUNT(DISTINCT qid) AS BIGINT)
                                AS n_queries,
                              COUNT(*) AS n_exact
                       FROM er WHERE rank <= 5)
               SELECT n_queries,
                      ${sqlRoundDet(
                        "CAST(n_hits AS DOUBLE) / CAST(n_exact AS DOUBLE)",
                        4)} AS recall
               FROM tot, hits""")),

    // ---- held-out split integrity -------------------------------------

    // Stratum × split counts under the 90/5/5 hash split: shows the
    // proportions hold per language and pins the assignment itself
    // (the md5 cut) to the oracle.
    Q("e6_stratified_split",
      (s, dir) => Curation.splitAssign(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.90, "val" -> 0.05), rest = "test")
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("split")),
      Some("""SELECT lang,
                     CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                            < 'e666' THEN 'train'
                          WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                            < 'f333' THEN 'val'
                          ELSE 'test' END AS split,
                     COUNT(*) AS n
              FROM documents
              GROUP BY lang, split
              ORDER BY lang, split""")),

    // Group-aware (leakage-safe) split: e6 assigns per DOCUMENT, so
    // near-identical docs from one source can straddle train/held —
    // exactly the eval contamination a decontamination pass exists
    // to catch. Keying the SAME md5 cut by source puts every
    // source's documents on one side by construction: each source
    // appears in exactly one (source, split) output row, which makes
    // the no-straddle invariant visible in the result itself.
    Q("e16_group_split",
      (s, dir) => Curation.splitAssign(t(s, dir, "documents"), "source",
          Seq("train" -> 0.80), rest = "held")
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source", "split"),
      Some("""SELECT source,
                     CASE WHEN substring(md5(source), 1, 4) < 'cccc'
                          THEN 'train' ELSE 'held' END AS split,
                     COUNT(*) AS n_docs
              FROM documents GROUP BY source, split
              ORDER BY source, split""")),

    // ---- outlier clipping ----------------------------------------------

    // Per-flag winsorization of extended price at the [p05, p95]
    // group band, summarized per group. Runs the operator's exact
    // route (interpolated percentile — DuckDB quantile_cont twin,
    // hash-proven by a13); the 100 TB route swaps in
    // approx_percentile with the same two-pass broadcast plan shape
    // (see Curation.winsorize scaladoc). min/max of the clipped
    // column equal the bounds whenever any row clips, so this row
    // also re-proves the cross-engine percentile interpolation match
    // on values that flow onward, not just values that get reported.
    Q("e9_winsorize",
      (s, dir) => Curation.winsorize(t(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice", 0.05, 0.95)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
             graft.ops.Ops.avgMoney(col("l_extendedprice")).as("avg_price"),
             graft.ops.Ops.roundDet(min(col("l_extendedprice")), 2)
               .as("min_price"),
             graft.ops.Ops.roundDet(max(col("l_extendedprice")), 2)
               .as("max_price"))
        .orderBy("l_returnflag"),
      Some(s"""WITH b AS (SELECT l_returnflag AS g,
                       quantile_cont(l_extendedprice, 0.05) AS lo,
                       quantile_cont(l_extendedprice, 0.95) AS hi
                     FROM lineitem GROUP BY 1),
               c AS (SELECT l_returnflag,
                       LEAST(GREATEST(l_extendedprice, lo), hi) AS v
                     FROM lineitem JOIN b ON l_returnflag = g)
               SELECT l_returnflag, COUNT(*) AS n_rows,
                      ${sqlAvg("v")} AS avg_price,
                      ${sqlRoundDet("MIN(v)", 2)} AS min_price,
                      ${sqlRoundDet("MAX(v)", 2)} AS max_price
               FROM c GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Temperature resampling of the language mix at α = 0.5: rarest
    // language keeps 100%, dominant languages downsample toward
    // balance — rates DERIVED from corpus counts (one bounded
    // class-keyed aggregate broadcast back), rows kept by the same
    // deterministic md5 slot as c3/e3/e6. The oracle replays the
    // whole chain: counts → pow(n, −0.5) → rate/max → floor·65536
    // hex bound → slot compare.
    Q("e11_temperature_mix",
      (s, dir) => Curation.temperatureMix(t(s, dir, "documents"), "lang",
          alpha = 0.5)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_after"))
        .orderBy("lang"),
      Some("""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents
                         GROUP BY lang),
                   w AS (SELECT lang, pow(CAST(n AS DOUBLE), -0.5) AS w
                         FROM c),
                   m AS (SELECT MAX(w) AS wmax FROM w),
                   r AS (SELECT lang AS cls,
                           CAST(FLOOR((w / wmax) * 65536.0) AS BIGINT)
                             AS bound
                         FROM w, m)
              SELECT lang, COUNT(*) AS n_after
              FROM documents JOIN r ON lang = cls
              WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
                    CASE WHEN bound >= 65536 THEN 'g'
                         ELSE printf('%04x', bound) END
              GROUP BY lang ORDER BY lang""")),

    // k-anonymity over the (nation, segment) quasi-identifier pair:
    // rows whose attribute combination describes fewer than 5
    // customers are re-identifiable and count as violations — the
    // privacy gate before user-derived columns enter a training mix.
    // Same (rule, n_checked, n_violations) shape as e7, so gates
    // compose; only the two QI columns ever shuffle.
    Q("e10_k_anonymity",
      (s, dir) => Expectations.kAnonymityCheck(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 5),
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
                         FROM customer GROUP BY 1, 2)
              SELECT 'k_anonymity' AS rule,
                     CAST(SUM(n) AS BIGINT) AS n_checked,
                     CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
                       AS n_violations
              FROM g"""))
  )
}
