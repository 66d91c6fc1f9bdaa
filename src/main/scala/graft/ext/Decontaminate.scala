package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (extension beyond the reference — SURVEY
  * §7.4): remove from a training corpus every document that shares a
  * word n-gram with a held-out evaluation set, the standard guard
  * against test-set leakage before pretraining.
  *
  * Mechanism: both sides shingle into word n-grams
  * ([[TextAnalysis.ngramArray]]), the corpus side explodes (shuffle
  * keyed by shingle, never by document pair), and the eval side —
  * contract-small: benchmarks are thousands of prompts, not
  * terabytes — broadcasts. A semi/inner join on the shingle plus a
  * doc-keyed count yields the flag list; an anti-join yields the
  * clean corpus.
  *
  * Scale posture at 100 TB: the only wide payload (document text)
  * never shuffles — shingling happens in the scan stage and only
  * (doc_id, shingle-hash) pairs move. Eval shingles are a broadcast
  * build side; with `broadcastEval = false` the join degrades to a
  * shuffled hash join for pathologically large eval sets.
  */
object Decontaminate {

  /** Distinct word n-gram shingles per document: (idCol, shingle).
    * The token array is materialized in its own projection BEFORE the
    * n-gram lambda: HOFs evaluate interpreted, and with `split`
    * inlined in the lambda the text was re-split per element —
    * O(len²) per document (c1 at sf0.1: 8.8 s inlined vs ~1 s
    * materialized; the optimizer does not collapse the alias into the
    * Generate, so the split runs once per row). */
  private def shingles(docs: DataFrame, n: Int, textCol: String,
                       idCol: String): DataFrame =
    docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col(idCol),
        explode(array_distinct(TextAnalysis.ngramArrayOfTokens(col("__tk"), n)))
          .as("shingle"))

  /** Documents of `docs` contaminated by `evalDocs`: any shared word
    * n-gram flags the document. Returns (idCol, n_matched) where
    * n_matched counts the DISTINCT corpus-side shingles that hit the
    * eval set — the evidence weight a review queue would sort by.
    * Documents present in both frames flag themselves (callers
    * exclude the eval ids when the eval set is carved from the same
    * table; see the c1 query). */
  def flagged(docs: DataFrame, evalDocs: DataFrame, n: Int = 3,
              textCol: String = "text", idCol: String = "doc_id",
              broadcastEval: Boolean = true): DataFrame = {
    val evalSh = shingles(evalDocs, n, textCol, idCol)
      .select("shingle").distinct()
    val build = if (broadcastEval) broadcast(evalSh) else evalSh
    shingles(docs, n, textCol, idCol)
      .join(build, Seq("shingle"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_matched"))
  }

  /** The clean corpus: `docs` minus every flagged document. Anti-join
    * on the id — document bodies stay in place; only ids shuffle. */
  def clean(docs: DataFrame, evalDocs: DataFrame, n: Int = 3,
            textCol: String = "text", idCol: String = "doc_id",
            broadcastEval: Boolean = true): DataFrame =
    docs.join(
      flagged(docs, evalDocs, n, textCol, idCol, broadcastEval)
        .select(idCol),
      Seq(idCol), "left_anti")

  /** Embedding-route decontamination — the paraphrase-leakage
    * complement to the n-gram route above: an eval prompt reworded
    * past any shared 3-gram still sits next to its source in
    * embedding space, so flag every corpus vector whose cosine
    * against ANY eval vector reaches `threshold`. Returns
    * (idCol, n_matched, max_cosine) — hit count and strongest match,
    * the two columns a leakage-review queue sorts by.
    *
    * EVERY (corpus, eval) pair is scored — ids never gate the join:
    * corpus and eval ids generally come from unrelated namespaces,
    * so an id-equality skip would silently suppress a contamination
    * hit on an accidental collision (a false negative in the safety
    * direction). A document present in BOTH frames therefore flags
    * itself at cosine 1.0 — the right answer for leakage review;
    * callers carving eval out of the corpus anti-join the eval ids
    * out first if self-hits are unwanted (the e13 query's split).
    *
    * Scale posture: the eval side is contract-small (benchmarks are
    * thousands of prompts) and broadcasts; the corpus streams
    * through ONE broadcast nested-loop join (keyless by design —
    * the e8 one-row-totals audit shape, bounded by the eval
    * contract) scoring |corpus|·|eval| pairs with the fused codegen
    * cosine, and only (id, cosine) survive the threshold filter —
    * embeddings never shuffle. For corpora where even that pair
    * count bites, pre-block with [[Similarity.ivfAssign]] and join
    * per bucket (the d9 route). */
  def semanticFlagged(corpus: DataFrame, evalEmb: DataFrame,
                      threshold: Double, vecCol: String = "embedding",
                      idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("__cid"),
      col(vecCol).cast("array<double>").as("__cv"))
    val e = evalEmb.select(col(idCol).as("__eid"),
      col(vecCol).cast("array<double>").as("__ev"))
    c.join(broadcast(e))
      .withColumn("cosine", graft.ops.Ops.roundDet(
        Similarity.cosine(col("__cv"), col("__ev")), 4))
      .filter(col("cosine") >= threshold)
      .groupBy(col("__cid"))
      .agg(count(lit(1)).as("n_matched"),
        max(col("cosine")).as("max_cosine"))
      .select(col("__cid").as(idCol), col("n_matched"), col("max_cosine"))
  }

  /** The semantically-clean corpus: `corpus` minus every
    * [[semanticFlagged]] vector — same anti-join shape as [[clean]]. */
  def semanticClean(corpus: DataFrame, evalEmb: DataFrame,
                    threshold: Double, vecCol: String = "embedding",
                    idCol: String = "vec_id"): DataFrame =
    corpus.join(
      semanticFlagged(corpus, evalEmb, threshold, vecCol, idCol)
        .select(idCol),
      Seq(idCol), "left_anti")
}
