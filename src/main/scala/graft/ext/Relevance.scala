package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ops

/** Relevance scoring over a document corpus (extension beyond the
  * reference — SURVEY §7.4): TF-IDF term weighting and BM25 ranked
  * retrieval, the two standard lexical-relevance primitives a
  * training-data pipeline uses for corpus triage (what is this
  * document about; which documents match a probe query) before any
  * embedding model gets involved.
  *
  * Scale posture, both operators:
  *  - corpus statistics (document count, per-term document frequency,
  *    average document length) are tiny by construction — one row, or
  *    vocabulary-sized — and attach to the corpus via broadcast joins;
  *    the corpus itself is never re-shuffled for them.
  *  - all floating-point score trees are fixed-shape and evaluated in
  *    deposit order, then rounded with [[Ops.roundDet]], so the DuckDB
  *    oracle reproduces them bit-exactly (the cosine/quality playbook).
  *  - ranking windows partition on bounded keys (`doc_id` for top
  *    terms — group size ≤ per-doc vocabulary; the global top-N for
  *    BM25 uses the two-phase partial top-k of
  *    [[Similarity.bruteForceTopK]] so no single task sees the corpus).
  */
object Relevance {

  /** Top-k TF-IDF terms per document.
    *
    * tf is the raw in-document term count; idf = ln(N / df) with df
    * counted over exact whitespace tokens — on a 100 TB corpus both
    * come from one (doc, term)-keyed aggregation, and the (term, df)
    * side stays vocabulary-sized, hence broadcast. Ranking happens on
    * the ROUNDED score (4dp) with a term-name tie-break, so rank is a
    * total order and both engines agree even when two raw scores
    * differ only in the last ulp of `ln`.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(dfreq), Seq("term"))
      .join(broadcast(nDocs)) // 1-row corpus stat
      .withColumn("score", Ops.roundDet(
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "score")
      .orderBy("doc_id", "rank")
  }

  /** Okapi BM25 top-N documents for a fixed bag of query terms.
    *
    * Per-document work is a single pass over the token array (one
    * codegen'd HOF count per query term — no explode, no shuffle);
    * the corpus statistics (N, Σdl, per-term df) reduce to ONE row and
    * broadcast back. The score tree is built in fixed term order and
    * summed left-to-right, so the oracle's identically-shaped
    * expression matches bit-for-bit before the 4dp round.
    *
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the standard
    * Robertson-Sparck Jones form, always ≥ 0.
    */
  def bm25TopDocs(docs: DataFrame, terms: Seq[String], topN: Int,
                  k1: Double = 1.2, b: Double = 0.75,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "bm25TopDocs needs at least one query term")
    // ONE regex split per row: the token array is projected into its
    // own column first, then every per-term tf (and dl) reads it —
    // inlining tokens(text) into each tf would re-split the full text
    // once per query term in the scan stage
    val tfCol = (t: String) =>
      size(filter(col("__tk"), x => x === lit(t)))
    val base = docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(
        col("doc_id") +:
          size(col("__tk")).as("dl") +:
          terms.zipWithIndex.map { case (t, i) => tfCol(t).as(s"tf_$i") }: _*)

    // one-row corpus statistics: N, total token mass, df per term
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*)

    val scored = base.join(broadcast(stats))
      .withColumn("score", bm25Score(terms.size, k1, b))

    // two-phase partial top-N (the bruteForceTopK pattern): rank
    // within each scan partition first, so the global window only
    // sees ≤ topN·numPartitions rows instead of the whole corpus.
    val wPart = Window.partitionBy(col("__pid"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("__pid", spark_partition_id())
      .withColumn("__prank", row_number().over(wPart))
      .filter(col("__prank") <= topN)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select("rank", "doc_id", "score")
      .orderBy("rank")
  }

  /** Reciprocal-rank fusion of a lexical and a dense result page —
    * the standard hybrid-retrieval combiner (rrf(d) = Σ 1/(k +
    * rank_list(d)), Cormack et al.'s k=60 default): each side
    * contributes 1/(k + rank) for documents it ranked and exactly
    * 0.0 for documents it did not, summed lexical-then-dense so the
    * DuckDB oracle reproduces the double bit-for-bit before the
    * 6 dp rounding. Both inputs are top-k pages (≤ k rows each, the
    * caller's contract), so the full-outer union and the final rank
    * window are bounded by construction — this operator never sees
    * the corpus, only two result pages. */
  def rrfFuse(lex: DataFrame, dense: DataFrame, topN: Int,
              k: Int = 60): DataFrame = {
    val l = lex.select(col("doc_id"), col("rank").cast("long").as("__lr"))
    val d = dense.select(col("doc_id"), col("rank").cast("long").as("__dr"))
    val fused = l.join(d, Seq("doc_id"), "full_outer")
      .withColumn("rrf", Ops.roundDet(
        coalesce(lit(1.0) / (lit(k.toDouble) + col("__lr").cast("double")),
          lit(0.0)) +
          coalesce(lit(1.0) / (lit(k.toDouble) + col("__dr").cast("double")),
            lit(0.0)), 6))
    val w = Window.orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("rank"), col("doc_id"), col("rrf"))
      .orderBy("rank")
  }

  /** [[rrfFuse]] on the batch dimension: per-qid reciprocal-rank
    * fusion of two BATCHED page frames (qid, rank, doc_id, …) — the
    * fusion stage of a batched hybrid serve. The join is keyed
    * (qid, doc_id) and the one rank window is qid-PARTITIONED (the
    * batch dimension is the partition key, exactly as in the
    * batched serves — this operator plans NO global window, unlike
    * its audited single-page sibling), so the plan stays bounded by
    * the pages: each side contributes ≤ k rows per qid by the
    * caller's contract. A qid present on only one side fuses that
    * page alone (the absent side contributes exactly 0.0 per doc —
    * [[rrfFuse]]'s own convention, batched). Each qid's output
    * equals `rrfFuse(lex_q, dense_q, topN)` by construction. */
  def rrfFuseMany(lex: DataFrame, dense: DataFrame, topN: Int,
                  k: Int = 60): DataFrame = {
    val l = lex.select(col("qid").cast("long").as("qid"),
      col("doc_id"), col("rank").cast("long").as("__lr"))
    val d = dense.select(col("qid").cast("long").as("qid"),
      col("doc_id"), col("rank").cast("long").as("__dr"))
    val fused = l.join(d, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf", Ops.roundDet(
        coalesce(lit(1.0) / (lit(k.toDouble) + col("__lr").cast("double")),
          lit(0.0)) +
          coalesce(lit(1.0) / (lit(k.toDouble) + col("__dr").cast("double")),
            lit(0.0)), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("qid"), col("rank"), col("doc_id"), col("rrf"))
      .orderBy("qid", "rank")
  }

  /** The BM25 score tree over the standard projected inputs —
    * columns `tf_i` / `df_i` (i < nTerms, query-term order), `dl`,
    * and the one-row corpus stats `n_docs` / `sum_dl`. Factored out
    * so [[bm25TopDocs]] (in-query scoring) and
    * [[KeywordIndex.probe]] (stored-postings scoring) build the
    * IDENTICAL fixed-shape expression — same subtree order, same
    * left-to-right term sum, same [[Ops.roundDet]] — which is what
    * makes the stored-index serve bit-exact against both the
    * in-query twin and the DuckDB oracle. */
  def bm25Score(nTerms: Int, k1: Double, b: Double): Column = {
    val nD = col("n_docs").cast("double")
    val dlNorm = bm25DlNorm(b)
    Ops.roundDet(
      (0 until nTerms).map(i => bm25TermScore(
          col(s"tf_$i").cast("double"), col(s"df_$i").cast("double"),
          nD, dlNorm, k1))
        .reduceLeft((a, c) => a + c), 4)
  }

  /** The per-document length-normalization factor of the BM25 tree
    * over the standard projected inputs (`dl`, 1-row `n_docs` /
    * `sum_dl`) — factored with [[bm25TermScore]] so every scorer
    * builds the identical subtree. */
  def bm25DlNorm(b: Double): Column = {
    val nD = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl)
  }

  /** ONE query term's BM25 contribution —
    * idf(df) · tf·(k1+1) / (tf + k1·dlNorm), the exact subtree
    * [[bm25Score]] sums in fixed term order. Public so
    * [[KeywordIndex.probeMany]]'s ordered HOF fold adds literally
    * this expression per held term: a term the document does NOT
    * hold contributes exactly 0.0 in the fixed-order sum (tf = 0 ⇒
    * the numerator is 0.0 and idf is finite), and x + 0.0 ≡ x
    * bit-for-bit over the non-negative partial sums, so folding only
    * the held terms in ascending term order is bit-identical to the
    * full fixed-order sum. */
  def bm25TermScore(tfD: Column, dfD: Column, nD: Column,
                    dlNorm: Column, k1: Double): Column = {
    val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    idf * (tfD * lit(k1 + 1.0)) / (tfD + lit(k1) * dlNorm)
  }

  /** Vocabulary coverage: what fraction of token OCCURRENCES a
    * top-`vocabSize` frequency vocabulary fails to cover (the OOV
    * rate) — the number that decides whether a tokenizer's vocab
    * budget fits a corpus before anyone trains with it. One bounded
    * report row: total occurrences, distinct types, and the OOV rate
    * at this budget.
    *
    * Plan: ONE corpus pass — a (token)-keyed aggregation — produces
    * the frequency table, and everything else derives from that
    * vocabulary-sized table alone: total occurrences = Σn, types =
    * row count, and OOV occurrences = Σn − Σ(top-`vocabSize` n), so
    * no second scan and no join back onto the token stream is ever
    * needed. The top cut orders by (count desc, token asc) — a total
    * order, so both engines agree on the boundary — and runs as a
    * TakeOrderedAndProject over the frequency table, never a global
    * sort. */
  def vocabCoverage(docs: DataFrame, vocabSize: Int,
                    textCol: String = "text"): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    // materialized executor-side: both consumers below would
    // otherwise re-run the corpus-sized explode+aggregate (lazy
    // lineage duplicates the subtree; exchange reuse is an AQE
    // runtime maybe, not a guarantee) — the table itself is
    // vocabulary-sized, so the checkpoint is cheap at any scale
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    val totals = counts.agg(
      coalesce(sum(col("__n")), lit(0L)).as("n_tokens"),
      count(lit(1)).as("n_types"))
    val covered = counts
      .orderBy(col("__n").desc, col("token")).limit(vocabSize)
      .agg(coalesce(sum(col("__n")), lit(0L)).as("__n_top"))
    totals.crossJoin(covered)
      .select(col("n_tokens"), col("n_types"),
        graft.ops.Ops.roundDet(
          (col("n_tokens") - col("__n_top")).cast("double") /
            col("n_tokens"), 6).as("oov_rate"))
  }

  /** Per-document character-bigram cross-entropy against a model
    * trained on the corpus itself — the in-engine analog of the
    * perplexity filter (CCNet-style) corpus pipelines run before
    * training: typical prose scores low bits-per-char, junk (base64,
    * foreign scripts, boilerplate markup) scores high. No external LM
    * is involved; the "model" is conditional bigram frequencies
    * P(c₂|c₁) = C(c₁c₂)/C(c₁·), which the corpus teaches in one
    * aggregation pass.
    *
    * score(d) = −(1/|bigrams(d)|) · Σ n_b · log2 P(b)  over d's
    * DISTINCT bigram types b. Self-scoring needs no smoothing: every
    * bigram a document contains is, by construction, in the model.
    *
    * Scale posture (round-7 rewrite — previously this shuffled the
    * full (doc, bigram) table TWICE: once into the model build, once
    * through a doc-keyed collect_list after a model join; the sweep
    * measured it as the heaviest non-pair-family query, x100 ≈ 17):
    * the ONLY shuffle left is the model build, whose groupBy(b)
    * map-side-combines each partition down to ≤ |alphabet²| partial
    * rows before the wire. The model then folds into a ONE-ROW
    * bigram → log2 P(b) map (alphabet²-bounded — the e8/t6/t7
    * one-row-broadcast pattern) and scoring is a purely NARROW
    * per-doc pass: sort the doc's bigram occurrence array, run-length
    * the sorted runs inside one `aggregate` fold, and add each
    * distinct type's n_b · log2 P(b) term in ascending bigram order —
    * bit-identical accumulation to the previous collect_list form and
    * to DuckDB's `list(... ORDER BY b)` (the t14/charEntropy
    * discipline): same terms, same order, same doubles. 4-dp rounding
    * absorbs the 1-ulp libm log2 spread. Docs shorter than 2 chars
    * are skipped (no bigrams — a 0/0 score would be undefined,
    * not 0). */
  def charBigramCrossEntropy(docs: DataFrame,
                             idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame = {
    // chars materialized in their own projection before the bigram
    // lambda (the HOF discipline — PlanGuard's recompute rule)
    val docBigrams = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), "").as("__cs"))
      .filter(size(col("__cs")) >= 2)
      .select(col("doc_id"),
        transform(sequence(lit(0), size(col("__cs")) - 2),
          i => concat(element_at(col("__cs"), i + 1),
            element_at(col("__cs"), i + 2))).as("__bs"))
      .localCheckpoint() // consumed twice: model build + scoring pass
    // model: corpus bigram counts → conditional log-probabilities →
    // ONE row carrying the bigram → log2(c12/c1) map
    val c12 = docBigrams
      .select(explode(col("__bs")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c12"))
    val model = c12
      .withColumn("__c1key", substring(col("b"), 1, 1))
      .withColumn("c1", sum(col("c12"))
        .over(Window.partitionBy(col("__c1key"))))
      .select(col("b"),
        log2(col("c12").cast("double") / col("c1").cast("double"))
          .as("lp"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("b"), col("lp"))))).as("__lp"))
    // scoring: narrow row-local fold — sorted occurrences run-length
    // into (type, n) runs, each run flushing n · log2 P(b); the fold
    // state is (sum-so-far, current run's bigram, current run length)
    docBigrams
      .crossJoin(broadcast(model))
      .select(col("doc_id"),
        size(col("__bs")).cast("long").as("n_bigrams"),
        sort_array(col("__bs")).as("__sbs"), col("__lp"))
      .select(col("doc_id"), col("n_bigrams"),
        graft.ops.Ops.roundDet(
          -aggregate(col("__sbs"),
            struct(lit(0.0).as("s"), lit("").as("b"), lit(0L).as("n")),
            (acc, x) => struct(
              when(acc.getField("b") === x, acc.getField("s"))
                .otherwise(acc.getField("s") +
                  when(acc.getField("n") > 0,
                    acc.getField("n").cast("double") *
                      element_at(col("__lp"), acc.getField("b")))
                    .otherwise(lit(0.0))).as("s"),
              x.as("b"),
              when(acc.getField("b") === x, acc.getField("n") + 1)
                .otherwise(lit(1L)).as("n")),
            acc => acc.getField("s") +
              acc.getField("n").cast("double") *
                element_at(col("__lp"), acc.getField("b"))) /
            col("n_bigrams"), 4).as("bits_per_char"))
      .orderBy("doc_id")
  }

  /** Pointwise-mutual-information collocations: adjacent token
    * bigrams whose joint frequency beats the independence prediction
    * of their unigram marginals —
    * pmi = log2( (c_ab/N2) / ((c_a/N1)·(c_b/N1)) ), the standard
    * collocation score (Church & Hanks 1990). High-PMI pairs are
    * multiword units ("new york"); boilerplate shows up as whole
    * high-PMI templates, which is why corpus-curation pipelines run
    * this alongside the frequency-only vocab reports (t5).
    *
    * Shape: one tokenize pass feeds both count tables (bigrams via
    * an index-lambda over the materialized token array — no
    * self-join); marginals attach by keyed joins on the bigram's
    * words; N1/N2 are the audited one-row-totals crossJoin. The
    * `minCount` floor (applied BEFORE the marginal joins) keeps the
    * PMI table off the hapax tail, which is both the statistical
    * convention (PMI of count-1 pairs is noise) and the scale bound:
    * candidates ≤ N2/minCount rows. Final top-k ranks on the ROUNDED
    * pmi with (left, right) tie-breaks so the cut is deterministic;
    * 4-dp rounding absorbs the 1-ulp libm log2 spread (the t14/t15
    * discipline). */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5, topK: Int = 50,
                 textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(TextAnalysis.tokens(col(textCol)).as("a"))
      .localCheckpoint() // consumed twice: unigram + bigram counts
    val uni = toks.select(explode(col("a")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bigAll = toks.filter(size(col("a")) >= 2)
      .select(explode(expr(
        "transform(slice(a, 1, size(a)-1), " +
          "(x, i) -> struct(x AS lw, a[i+1] AS rw))")).as("p"))
      .select(col("p.lw").as("lw"), col("p.rw").as("rw"))
      .groupBy("lw", "rw").agg(count(lit(1)).as("c_ab"))
    // totals BEFORE the minCount floor — the floor prunes candidates,
    // not the probability space
    val totals = uni.agg(sum(col("c")).cast("long").as("n1"))
      .crossJoin(bigAll.agg(sum(col("c_ab")).cast("long").as("n2")))
    bigAll.filter(col("c_ab") >= minCount)
      .join(uni.select(col("w").as("lw"), col("c").as("c_l")), "lw")
      .join(uni.select(col("w").as("rw"), col("c").as("c_r")), "rw")
      .crossJoin(broadcast(totals))
      .select(col("lw"), col("rw"), col("c_ab"),
        graft.ops.Ops.roundDet(log2(
          (col("c_ab").cast("double") / col("n2")) /
            ((col("c_l").cast("double") / col("n1")) *
              (col("c_r").cast("double") / col("n1")))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("lw"), col("rw"))
      .limit(topK)
  }
}
