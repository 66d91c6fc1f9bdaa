package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-corpus cleaning pipeline — the end-to-end
  * flow the extension operators exist for: score → gate → dedup, as
  * one declarative plan (Catalyst fuses the scoring expressions into
  * the scan projection; the only shuffle is the dedup's fingerprint
  * hash-partition).
  *
  * At 100 TB this shape matters: every per-row stage (token counts,
  * quality, language id, fingerprint) is a column expression pipelined
  * inside the scan stage, rows failing the gate never reach the
  * shuffle, and the dedup shuffles only (fingerprint, doc_id) plus
  * whatever columns the caller keeps.
  */
object CorpusPipeline {

  /** Score, gate, and exact-dedup a document corpus. Returns the
    * surviving docs with their scores, deterministically ordered. */
  def clean(docs: DataFrame, minQuality: Double = 0.5,
            minTokens: Int = 20, keepLang: Option[String] = None,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val scored = docs.select(col(idCol), col(textCol),
      TextAnalysis.qualityScore(col(textCol)).as("quality"),
      TextAnalysis.langId(col(textCol)).as("lang_pred"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
    val gated = scored
      .filter(col("quality") >= minQuality && col("n_tokens") >= minTokens)
    val langGated = keepLang.fold(gated)(l => gated.filter(col("lang_pred") === l))
    Dedup.exactByFingerprint(langGated, textCol, idCol)
      .select(idCol, "quality", "lang_pred", "n_tokens")
      .orderBy(idCol)
  }

  /** The full near-dup-aware variant: score → gate → exact dedup →
    * n-gram-Jaccard near-dup pairs → connected components → keep ONE
    * canonical (lowest-id) document per near-dup group. This is the
    * production corpus-dedup flow end-to-end: pairwise similarity
    * alone cannot decide survivors — A~B, B~C must collapse to one
    * cluster — so the component step is what makes the output an
    * actual dataset rather than a report. Non-matched docs pass
    * through (left join against the component labels). */
  def cleanNearDups(docs: DataFrame, minQuality: Double = 0.5,
                    minTokens: Int = 20, jaccardThreshold: Double = 0.4,
                    blockCol: String = "lang",
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val scored = docs.select(col(idCol), col(textCol), col(blockCol),
      TextAnalysis.qualityScore(col(textCol)).as("quality"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
    val gated = scored
      .filter(col("quality") >= minQuality && col("n_tokens") >= minTokens)
    val exact = Dedup.exactByFingerprint(gated, textCol, idCol)
    val comps = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(exact, jaccardThreshold,
        blockCol = blockCol, textCol = textCol, idCol = idCol))
    exact
      .join(broadcast(comps.select(col("id").as(idCol), col("comp"))),
        Seq(idCol), "left")
      // survivors: docs that are their own component minimum, or that
      // matched nothing (comp null)
      .filter(col("comp").isNull || col("comp") === col(idCol))
      .select(idCol, "quality", "n_tokens")
      .orderBy(idCol)
  }

  /** [[cleanNearDups]] with a QUALITY-AWARE survivor rule: each
    * near-dup group keeps its highest-quality member (ties to lowest
    * id) instead of its lowest id. This is what production corpus
    * dedup usually wants — of N mirror copies of a page, keep the
    * best-scoring version, not the one that happened to get the
    * smallest id at crawl time. Same plan shape as cleanNearDups
    * plus one group-keyed rank window over the component label
    * (comp is broadcast-joined; singletons coalesce to their own
    * id, so un-matched docs survive unconditionally). */
  def cleanNearDupsBestQuality(docs: DataFrame, minQuality: Double = 0.5,
                               minTokens: Int = 20,
                               jaccardThreshold: Double = 0.4,
                               blockCol: String = "lang",
                               textCol: String = "text",
                               idCol: String = "doc_id"): DataFrame = {
    val scored = docs.select(col(idCol), col(textCol), col(blockCol),
      TextAnalysis.qualityScore(col(textCol)).as("quality"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
    val gated = scored
      .filter(col("quality") >= minQuality && col("n_tokens") >= minTokens)
    val exact = Dedup.exactByFingerprint(gated, textCol, idCol)
    val comps = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(exact, jaccardThreshold,
        blockCol = blockCol, textCol = textCol, idCol = idCol))
    val labeled = exact
      .join(broadcast(comps.select(col("id").as(idCol), col("comp"))),
        Seq(idCol), "left")
      .withColumn("grp", coalesce(col("comp"), col(idCol)))
    graft.ops.Ops.dedupFirst(labeled, Seq("grp"),
        Seq(col("quality").desc, col(idCol).asc))
      .select(idCol, "quality", "n_tokens")
      .orderBy(idCol)
  }

  /** The selection pass that runs AFTER cleaning: clean → cap every
    * class at its k best-quality documents ([[Curation.balancedTopK]])
    * → deterministic held-out hash split ([[Curation
    * .deterministicSample]] complement). Returns the training-mix
    * rows (class, rank, id, quality, train/holdout split) — the
    * composed curate step a mix builder consumes directly.
    *
    * Shuffle inventory: everything `clean` pays, plus ONE shuffle
    * keyed on the class column for the cap window; the hash split is
    * a per-row predicate. The gate runs before the window, so capped
    * classes never shuffle their rejected rows' text — only the
    * projected metadata columns move. */
  def curate(docs: DataFrame, classCol: String, perClassCap: Int,
             holdoutBound: String = "1a",
             minQuality: Double = 0.5, minTokens: Int = 20,
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // same guard as Curation.deterministicSample: a malformed bound
    // (wrong width or non-hex chars like "z3") would silently skew the
    // lexicographic compare to a wrong split rate instead of failing
    require(holdoutBound.matches("[0-9a-f]{2}"),
      s"holdoutBound must be two lowercase hex digits, got '$holdoutBound'")
    val cleaned = docs
      .select(col(idCol), col(textCol), col(classCol),
        TextAnalysis.qualityScore(col(textCol)).as("quality"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .filter(col("quality") >= minQuality && col("n_tokens") >= minTokens)
    val deduped = Dedup.exactByFingerprint(cleaned, textCol, idCol)
      .select(col(idCol), col(classCol), col("quality"))
    Curation.balancedTopK(deduped, classCol, perClassCap,
      col("quality").desc, col(idCol).asc)
      // split as text, not boolean: the driver hash-compare's proven
      // emission types are {BIGINT, DOUBLE, TIMESTAMP, VARCHAR}
      .withColumn("split",
        when(Curation.md5Hex(col(idCol), 2) < holdoutBound,
          "holdout").otherwise("train"))
      .select(col(classCol), col("rank"), col(idCol), col("quality"),
        col("split"))
      .orderBy(col(classCol), col("rank"))
  }
}
