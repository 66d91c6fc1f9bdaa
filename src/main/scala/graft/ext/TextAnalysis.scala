package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline
  * (extension beyond the reference — SURVEY §7.4): token counting,
  * quality scoring, language identification, fingerprinting. All are
  * per-row column expressions built from codegen'd built-ins (split /
  * regexp / higher-order array functions) — no UDFs, no shuffles, so
  * they stream through a parquet scan at any scale.
  */
object TextAnalysis {

  /** All per-row statistics in ONE imperative pass
    * ([[graft.functions.TextStats]]): Catalyst does not CSE regex
    * calls across expressions, so the r1 formulation (split /
    * regexp_extract_all / HOF filter per statistic) paid ~4-9 string
    * scans per row — t1/t2 were the #4/#5 most expensive bench
    * queries. Every accessor below extracts a field of this struct;
    * identical struct subtrees collapse to a single evaluation under
    * whole-stage codegen subexpression elimination. Field semantics
    * are bit-identical to the r1 regex formulations (Java `\s+` split
    * counting, BPE-ish match counting, code-point length), so oracle
    * SQL and result hashes are unchanged. */
  def stats(text: Column): Column =
    graft.functions.GraftFunctions.text_stats(text)

  /** Whitespace tokens of a text column (array form — used by the
    * shingling dedup family, which needs the tokens themselves). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = stats(text).getField("n_tokens")

  /** BPE-ish token count: letter runs, single digits, and single
    * punctuation marks — the pre-tokenization split most BPE vocabs
    * (GPT-2 style) apply before merges. A cheap, deterministic proxy
    * for LLM token budgeting over 100 TB of text. */
  def bpeishTokenCount(text: Column): Column = stats(text).getField("n_bpeish")

  /** Punctuation character count. */
  def punctCount(text: Column): Column = stats(text).getField("n_punct")

  /** Stopword hits: number of tokens present in `stopwords`. The
    * general form (arbitrary stopword list) keeps the declarative HOF
    * formulation; the fixed English list used by [[qualityScore]]
    * rides the fused stats pass instead. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(sw, t)))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Document quality score in [0,1], rounded to 4dp: rewards
    * mid-length documents, low punctuation density and a sane
    * stopword ratio — the standard cheap quality gate applied before
    * expensive dedup/training-set filtering. Deterministic double arithmetic
    * (single fixed expression tree), so it oracle-compares exactly. */
  def qualityScore(text: Column): Column = {
    val st = stats(text)
    val nTok = st.getField("n_tokens").cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val punctRatio = st.getField("n_punct").cast("double") /
      greatest(st.getField("n_chars"), lit(1)).cast("double")
    val punctScore = greatest(lit(1.0) - punctRatio * lit(10.0), lit(0.0))
    val swRatio = st.getField("n_stop").cast("double") / greatest(nTok, lit(1.0))
    val swScore = least(swRatio * lit(5.0), lit(1.0))
    graft.ops.Ops.roundDet(
      lenScore * lit(0.4) + punctScore * lit(0.3) + swScore * lit(0.3), 4)
  }

  /** Word n-grams over an ALREADY-TOKENIZED array column (empty when
    * fewer than n tokens). Callers with a text column should project
    * `tokens(text)` into its own column first and pass that: higher-
    * order functions are CodegenFallback (interpreted), so any
    * expression inside the lambda is re-evaluated per element — with
    * `split` inlined that made shingling O(len²) per document
    * (re-splitting the full text for every element access, measured
    * 8.8 s on c1 at sf0.1 vs ~1 s with the tokens materialized). */
  def ngramArrayOfTokens(tk: Column, n: Int): Column = {
    require(n >= 1, s"ngramArray needs n >= 1, got $n")
    when(size(tk) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(tk) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(tk, i + lit(j + 1))): _*)))
  }

  /** Word n-grams of a text column as an array — the building block
    * for [[repetitionScore]]. Convenience form of
    * [[ngramArrayOfTokens]]; hot paths (Decontaminate) project the
    * token array first instead, see the scaladoc there. */
  def ngramArray(text: Column, n: Int): Column =
    ngramArrayOfTokens(tokens(text), n)

  /** Intra-document repetition: the duplicated fraction of word
    * n-grams, 1 − |distinct n-grams| / |n-grams| (0 when the doc is
    * too short to have any). High values flag boilerplate/looping
    * text — the standard repetition quality gate applied alongside
    * [[qualityScore]] before training-set admission. Deterministic
    * double arithmetic, rounded to 4dp, so it oracle-compares
    * exactly. */
  def repetitionScore(text: Column, n: Int): Column =
    repetitionScoreOfTokens(tokens(text), n)

  /** [[repetitionScore]] over a pre-materialized token array — the
    * hot-path form: callers project `tokens(text)` into a column
    * first so the interpreted n-gram lambda reads the array instead
    * of re-splitting the text per element (the
    * [[ngramArrayOfTokens]] lesson). */
  def repetitionScoreOfTokens(tk: Column, n: Int): Column = {
    val ng = ngramArrayOfTokens(tk, n)
    graft.ops.Ops.roundDet(
      when(size(ng) === 0, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(ng)).cast("double") /
          size(ng).cast("double")), 4)
  }

  /** Stopword scrub: drop `stopwords` tokens and re-join on single
    * spaces — the lexical normalization applied before shingling /
    * vocabulary building so function words don't dominate n-gram
    * space. Per-row HOF chain (split → filter → join), no shuffle. */
  def scrubStopwords(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    array_join(filter(tokens(text), t => !array_contains(sw, t)), " ")
  }

  /** Language marker words for the n-gram-heuristic language id. The
    * test corpus is synthetic English-ish text, so markers matter less
    * than the mechanism: count marker hits per language, pick the
    * argmax with a deterministic tie-break (higher score wins; ties
    * break toward the earlier entry in this list). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "que", "es", "y"),
    "fr" -> Seq("le", "la", "les", "est", "et", "ne"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "ni"))

  /** Heuristic language id: argmax of marker-hit counts, "und"
    * (undetermined) when nothing matches. */
  def langId(text: Column): Column = {
    val st = stats(text)
    val scored = LangMarkers.map(_._1).zip(
      graft.functions.TextStats.langFields.map(st.getField))
    // fold right-to-left so earlier languages win ties via strict >
    val (bestLang, _) = scored.reverse.foldLeft(
        (lit("und"), lit(0).cast("int"))) {
      case ((accLang, accScore), (lang, score)) =>
        (when(score > accScore, lit(lang)).otherwise(accLang),
         when(score > accScore, score).otherwise(accScore))
    }
    bestLang
  }

  /** Content fingerprint: md5 of the lowercased, whitespace-collapsed
    * text. Stable across engines (md5 is standard), so it doubles as
    * the exact-dedup key — see [[Dedup.exactByFingerprint]]. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Shannon entropy (bits) of the text's code-point distribution —
    * the cheap junk detector run alongside the quality gates:
    * near-zero flags degenerate repetition ("aaaa…"), ~log2(alphabet)
    * flags random noise (base64 blobs, hash dumps); prose sits in a
    * stable mid band. One codegen'd pass per row
    * ([[graft.functions.CharEntropy]]), no shuffle. */
  def charEntropy(text: Column): Column =
    graft.functions.GraftFunctions.char_entropy(text)

  /** PII redaction patterns, applied in order — URLs first so an
    * address embedded in a URL is consumed as part of the URL, not
    * matched again by a later pattern. Every pattern is valid in both
    * Java regex and RE2 (character classes, bounded repetition, \b —
    * no backrefs or lookaround), so the DuckDB oracle applies the
    * same strings verbatim. (name, pattern, replacement). */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[A-Za-z0-9./_%?=&:#@~+-]+", "[URL]"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "[PHONE]"))

  /** Redact emails / URLs / IPv4s / phone numbers to typed
    * placeholders — the pre-training privacy-scrub pass. A fold of
    * codegen'd `regexp_replace` calls: per-row, no shuffle, streams
    * through the scan like every other text op here. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, p, r)) =>
      regexp_replace(c, p, r)
    }

  /** Match count of one [[PiiPatterns]] pattern against the raw text
    * (detection metric; counts are pre-redaction so overlapping
    * pattern classes count independently). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Corpus-wide boilerplate line scrub (the C4 / RefinedWeb step):
    * split every document into lines, drop each line that occurs in
    * at least `minDocs` DISTINCT documents (nav bars, cookie
    * banners, "subscribe" footers — the text that repeats across a
    * crawl without being a duplicate document), and reassemble the
    * survivors in original order. Returns (idCol, textCol) with the
    * scrubbed text; a document whose every line was boilerplate
    * keeps its row with empty text (dropping rows is a separate,
    * explicit decision — compose with a length gate).
    *
    * Scale shape: the line explode is the only corpus-sized
    * relation; the occurrence count and the scrub anti-join are both
    * keyed on md5(line) — fingerprints, never line bodies, cross the
    * wire for counting; reassembly is one id-keyed aggregate with
    * order restored by position
    * (array_sort over (pos, line) structs). The boilerplate set
    * itself (lines in ≥ minDocs docs) is crawl-template-sized, not
    * corpus-sized.
    *
    * Spec-verified (PipeSpec) rather than driver-queried: the
    * synthetic documents fixture carries no newlines, so a registry
    * row would only re-test whole-document dedup (d1's job). */
  def scrubBoilerplateLines(docs: DataFrame, minDocs: Long,
                            textCol: String = "text",
                            idCol: String = "doc_id",
                            sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("pos", "line")))
    val boiler = lines
      .groupBy(md5(col("line")).as("__lf"))
      .agg(count_distinct(col("id")).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select("__lf")
    lines
      .join(boiler, md5(col("line")) === col("__lf"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        x => x.getField("line")), sep).as(textCol))
      .withColumnRenamed("id", idCol)
      // left join back so all-boilerplate docs keep a row (the
      // aggregate above only sees docs with surviving lines)
      .join(docs.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col(textCol), lit("")).as(textCol))
  }

  /** One-pass corpus data card: the `(metric, value)` report a
    * training run pins its input corpus with — volume (docs, tokens,
    * chars, averages), hygiene (exact-dup rate via the content
    * fingerprint, low-quality share under the standard 0.5 gate) and
    * language mix (share per [[LangMarkers]] language + `und`).
    *
    * One scan, one aggregation: every per-doc signal (token count,
    * quality, language, fingerprint) is projected in a single fused
    * pass over the text ([[graft.functions.TextStats]] — codegen'd,
    * no UDFs), then all card metrics reduce in one `agg` whose only
    * full-shuffle participant is the exact-dup `count_distinct` on
    * the 16-byte fingerprint (inherent to an EXACT dup rate; the
    * approximate posture is `approx_count_distinct`, the a11 recipe).
    * At 100 TB: map-side partials for everything else, a keys-only
    * (fingerprint) exchange, a 1-row result exploded to metric rows.
    *
    * Quality sums in DECIMAL(18,4) — per-doc scores are exact 4-dp
    * values, so the sum is order-independent and the avg
    * oracle-exact (the money-sum discipline, [[graft.ops.Ops
    * .sumMoney]]). Ratios round via roundDet (4dp averages, 6dp
    * rates). */
  def datacard(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val proj = docs.select(
      tokenCount(text).cast("double").as("t"),
      qualityScore(text).as("q"),
      langId(text).as("l"),
      fingerprint(text).as("f"),
      length(text).cast("double").as("c"))
    val langs = LangMarkers.map(_._1) :+ "und"
    val aggs: Seq[Column] = Seq(
      sum(col("t")).as("n_tokens"),
      sum(col("c")).as("n_chars"),
      sum(col("q").cast("decimal(18,4)")).as("q_sum"),
      count_distinct(col("f")).cast("double").as("n_fp"),
      sum(when(col("q") < 0.5, 1L).otherwise(0L)).cast("double")
        .as("n_lowq")) ++
      langs.map(lg => sum(when(col("l") === lg, 1L).otherwise(0L))
        .cast("double").as(s"n_$lg"))
    val one = proj.agg(
      count(lit(1)).cast("double").as("n_docs"), aggs: _*)
    def rd(c: Column, s: Int) = graft.ops.Ops.roundDet(c, s)
    val metrics: Seq[(String, Column)] = Seq(
      "n_docs" -> col("n_docs"),
      "n_tokens" -> col("n_tokens"),
      "n_chars" -> col("n_chars"),
      "avg_tokens" -> rd(col("n_tokens") / col("n_docs"), 4),
      "avg_chars" -> rd(col("n_chars") / col("n_docs"), 4),
      "avg_quality" -> rd(col("q_sum").cast("double") / col("n_docs"), 4),
      "dup_rate" -> rd(lit(1.0) - col("n_fp") / col("n_docs"), 6),
      "low_quality_rate" -> rd(col("n_lowq") / col("n_docs"), 6)) ++
      langs.map(lg =>
        s"share_$lg" -> rd(col(s"n_$lg") / col("n_docs"), 6))
    one.select(array(metrics.map { case (n, c) =>
        struct(lit(n).as("metric"), c.cast("double").as("value"))
      }: _*).as("a"))
      .select(explode(col("a")).as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"))
      .orderBy("metric")
  }
}
