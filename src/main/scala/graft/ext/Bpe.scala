package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich-style byte/char-pair
  * encoding) — the tokenizer-training step of a data pipeline,
  * structured the way it scales:
  *
  *  1. ONE corpus pass reduces the text to a word-frequency table
  *     (explode tokens → groupBy word). This is the only stage whose
  *     cost grows with corpus size, and it is the cheapest possible
  *     full pass (one partial+final aggregate, word keys only).
  *  2. Every merge round then runs over the VOCABULARY table
  *     (≤ a few hundred thousand rows regardless of corpus scale):
  *     explode adjacent symbol pairs weighted by word count, pick the
  *     max-count pair, and apply the merge to the symbol arrays via a
  *     left-to-right `aggregate` fold (matching reference BPE's
  *     sequential merge application on overlaps like "aaa").
  *
  * One bounded driver read per round (the winning pair — the same
  * bounded-scalar pattern as the watermark reads); the vocabulary
  * is localCheckpointed per round so round k+1 does not replay
  * rounds 1..k's lineage. Tie-break is deterministic: max count,
  * then lexicographic (left, right) — so the learned merge table is
  * reproducible across runs, partitionings, and engines.
  *
  * Iterative state evolution is not expressible as one SQL query, so
  * this operator is spec-verified (BpeSpec: hand-computed merges on a
  * classic corpus, overlap semantics, determinism) rather than
  * DuckDB-oracled — the same verification class as the write-side
  * pipeline stages.
  */
object Bpe {

  /** Word-frequency table: (word, n). The single corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learned merge table after `numMerges` rounds:
    * (round, left, right, pair_count), round 1-based in learn order. */
  def train(spark: SparkSession, docs: DataFrame, numMerges: Int,
            textCol: String = "text"): DataFrame = {
    import spark.implicits._
    require(numMerges >= 1, s"need numMerges >= 1, got $numMerges")

    // initial symbolization: one single-char symbol per character,
    // "</w>" end-of-word marker so merges can't cross word boundaries
    var vocab = wordCounts(docs, textCol)
      .select(col("n"), concat(
        transform(split(col("word"), ""), c => c),
        array(lit("</w>"))).as("syms"))
      .localCheckpoint()

    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= numMerges && !exhausted) {
      // adjacent pair counts, weighted by word frequency
      val best = vocab
        .select(col("n"), col("syms"), posexplode(slice(col("syms"), lit(1),
          greatest(size(col("syms")) - 1, lit(0)))).as(Seq("i", "left")))
        .withColumn("right", element_at(col("syms"), col("i") + 2))
        .groupBy("left", "right").agg(sum(col("n")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(1) // bounded driver read: the ONE winning pair
        .as[(String, String, Long)].collect().headOption
      best match {
        case None => exhausted = true
        case Some((l, r, c)) =>
          merges += ((round, l, r, c))
          val merged = lit(l + r)
          // left-to-right fold: if the accumulator ends with `l` and
          // the next symbol is `r`, replace the tail with the merged
          // symbol — reference BPE's sequential overlap semantics
          vocab = vocab.select(col("n"), aggregate(
            col("syms"),
            array().cast("array<string>"),
            (acc, x) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
              .otherwise(concat(acc, array(x)))).as("syms"))
            .localCheckpoint()
          round += 1
      }
    }
    merges.result().toDF("round", "left", "right", "pair_count")
  }

  /** Apply a learned merge table to text — the encode side: each word
    * symbolizes to characters + the `</w>` marker, then every merge
    * is applied in learn order with the same left-to-right fold
    * [[train]] uses, so encode(train corpus) reproduces the training
    * segmentation exactly. Returns the per-row token-array column.
    *
    * Cost model: per row, |merges| fold passes over ≤ word-length
    * symbol arrays — pure narrow map, no shuffle, rides the scan.
    * The merge table is a driver-side Seq by contract (a tokenizer
    * has a bounded merge list; it is config, not data). */
  def encode(text: org.apache.spark.sql.Column,
             merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    // drop empty tokens (leading/trailing whitespace artifacts of the
    // split) — training's wordCounts filters them too, and an empty
    // word would otherwise emit a spurious ["", "</w>"] pair
    val words = filter(TextAnalysis.tokens(text), w => length(w) > 0)
    val symbolized = transform(words, w =>
      concat(transform(split(w, ""), c => c), array(lit("</w>"))))
    val encodedWords = merges.foldLeft(symbolized) { case (acc, (l, r)) =>
      val merged = lit(l + r)
      transform(acc, syms => aggregate(
        syms,
        array().cast("array<string>"),
        (a, x) => when(
          size(a) > 0 && element_at(a, -1) === lit(l) && x === lit(r),
          concat(slice(a, lit(1), size(a) - 1), array(merged)))
          .otherwise(concat(a, array(x)))))
    }
    flatten(encodedWords)
  }
}
