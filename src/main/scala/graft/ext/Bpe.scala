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

  /** Initial symbolization of a word-frequency table: one single-char
    * symbol per character plus the `</w>` end-of-word marker, so
    * merges can't cross word boundaries. */
  private def symbolize(wc: DataFrame): DataFrame =
    wc.select(col("n"), concat(
      transform(split(col("word"), ""), c => c),
      array(lit("</w>"))).as("syms"))

  /** Adjacent symbol-pair counts over a symbolized vocabulary,
    * weighted by word frequency — the per-round aggregate every merge
    * round runs. (left, right, pair_count), unordered. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("n"), col("syms"), posexplode(slice(col("syms"), lit(1),
        greatest(size(col("syms")) - 1, lit(0)))).as(Seq("i", "left")))
      .withColumn("right", element_at(col("syms"), col("i") + 2))
      .groupBy("left", "right").agg(sum(col("n")).as("pair_count"))

  /** Round-1 pair counts straight from text — the SQL-oracle-able
    * slice of training (a plain tokenize → char-pair → weighted
    * count, no iterative state), registered as driver row
    * b1_bpe_pair_counts with a DuckDB oracle. By construction the
    * top-ranked row here IS the first merge [[train]] learns. */
  def initialPairCounts(docs: DataFrame,
                        textCol: String = "text"): DataFrame =
    pairCounts(symbolize(wordCounts(docs, textCol)))

  /** Drop the block-manager storage behind a `localCheckpoint()`ed
    * frame once the NEXT round's checkpoint has materialized — without
    * this, O(rounds) checkpointed RDDs accumulate for the life of the
    * session (each one a full copy of the vocab table). */
  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(false))

  /** [[trainWithStats]] result: the learned merge table plus the
    * number of Spark aggregation rounds it cost — the scheduler-
    * overhead number the batch dial exists to cut. */
  case class TrainResult(merges: DataFrame, aggregationRounds: Int)

  /** Learned merge table after `numMerges` merges:
    * (round, left, right, pair_count), round 1-based in learn order.
    *
    * ROUNDS BUDGET: each aggregation round is one full pair-count
    * aggregate over the vocabulary table plus one bounded driver read,
    * so training costs ceil(numMerges / merges-accepted-per-round)
    * Spark jobs. At `batch = 1` (the default) that is numMerges jobs —
    * exact Sennrich BPE, but a real 32k-merge vocabulary would be 32k
    * jobs of pure scheduler overhead. `batch = B` accepts up to B
    * NON-INTERACTING merges per aggregation (classic batched BPE):
    * candidates are taken in (count desc, left, right) order and
    * accepted only if none of {left, right, left+right} was touched
    * by an earlier acceptance this round — so no accepted merge can
    * create or destroy occurrences of a later one, every accepted
    * pair's recorded count is still exact, and the fold application
    * order within the round cannot change any applied merge's effect.
    *
    * The trade (standard for batched BPE trainers): pairs CREATED by
    * this round's merges only become candidates next round, so when a
    * follow-on pair (e.g. ("xy", "</w>") right after x+y merges)
    * would outrank a later batch pick, the learned ORDER differs from
    * batch=1 — same greedy family, coarser horizon. BpeSpec pins the
    * regimes: exact equality batch=1 vs batch=8 on a fixture with no
    * in-round follow-ons, and the rounds cut on a corpus where
    * batching engages. */
  def train(spark: SparkSession, docs: DataFrame, numMerges: Int,
            textCol: String = "text", batch: Int = 1): DataFrame =
    trainWithStats(spark, docs, numMerges, textCol, batch).merges

  /** [[train]], also reporting the aggregation-round count. */
  def trainWithStats(spark: SparkSession, docs: DataFrame, numMerges: Int,
                     textCol: String = "text",
                     batch: Int = 1): TrainResult = {
    import spark.implicits._
    require(numMerges >= 1, s"need numMerges >= 1, got $numMerges")
    require(batch >= 1, s"need batch >= 1, got $batch")

    // initial symbolization: one single-char symbol per character,
    // "</w>" end-of-word marker so merges can't cross word boundaries
    var vocab = symbolize(wordCounts(docs, textCol)).localCheckpoint()

    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var learned = 0
    var rounds = 0
    var exhausted = false
    while (learned < numMerges && !exhausted) {
      // adjacent pair counts, weighted by word frequency; the driver
      // read stays bounded — enough ranked candidates to usually fill
      // the batch after the non-interaction filter, never the table
      val want = math.min(batch, numMerges - learned)
      val cands = pairCounts(vocab)
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(math.max(4 * want, 8)) // bounded driver read
        .as[(String, String, Long)].collect()
      rounds += 1
      if (cands.isEmpty) exhausted = true
      else {
        // greedy non-interacting selection in rank order: a candidate
        // is safe iff none of its symbols — nor the symbol it would
        // mint — collides with anything an earlier acceptance touched
        val used = scala.collection.mutable.Set.empty[String]
        val accepted = Seq.newBuilder[(String, String, Long)]
        var nAccepted = 0
        for ((l, r, c) <- cands if nAccepted < want) {
          if (!Seq(l, r, l + r).exists(used)) {
            accepted += ((l, r, c))
            used ++= Seq(l, r, l + r)
            nAccepted += 1
          }
        }
        // apply the round's merges IN RANK ORDER, each as the same
        // left-to-right fold as batch=1 (reference BPE's sequential
        // overlap semantics); non-interaction makes the chain exact
        val prev = vocab
        val folded = accepted.result().foldLeft(prev) {
          case (df, (l, r, c)) =>
            learned += 1
            merges += ((learned, l, r, c))
            val merged = lit(l + r)
            df.select(col("n"), aggregate(
              col("syms"),
              array().cast("array<string>"),
              (acc, x) => when(
                size(acc) > 0 && element_at(acc, -1) === lit(l) &&
                  x === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
                .otherwise(concat(acc, array(x)))).as("syms"))
        }
        vocab = folded
          .localCheckpoint() // eager: materialized before prev is dropped
        dropCheckpoint(prev)
      }
    }
    dropCheckpoint(vocab) // the merge table lives driver-side; the
    // final vocab frame is not returned, so free its blocks too
    TrainResult(
      merges.result().toDF("round", "left", "right", "pair_count"), rounds)
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
             merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    flatten(mergeFold(symbolizeWords(text), merges))

  /** One projection's worth of [[encode]]: per-word symbol arrays
    * from the raw text column. Drops empty tokens (leading/trailing
    * whitespace artifacts of the split) — training's wordCounts
    * filters them too, and an empty word would otherwise emit a
    * spurious ["", "</w>"] pair. */
  private def symbolizeWords(
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val words = filter(TextAnalysis.tokens(text), w => length(w) > 0)
    transform(words, w =>
      concat(transform(split(w, ""), c => c), array(lit("</w>"))))
  }

  /** Apply `merges` in learn order to a words×symbols array column —
    * the same left-to-right fold [[train]] uses. */
  private def mergeFold(symbolized: org.apache.spark.sql.Column,
                        merges: Seq[(String, String)])
      : org.apache.spark.sql.Column =
    merges.foldLeft(symbolized) { case (acc, (l, r)) =>
      val merged = lit(l + r)
      transform(acc, syms => aggregate(
        syms,
        array().cast("array<string>"),
        (a, x) => when(
          size(a) > 0 && element_at(a, -1) === lit(l) && x === lit(r),
          concat(slice(a, lit(1), size(a) - 1), array(merged)))
          .otherwise(concat(a, array(x)))))
    }

  /** [[encode]] evaluated in STAGES of `chunk` merges with a
    * materialization barrier between stages. The Column form nests
    * one lambda layer per merge into a single expression, and
    * Catalyst's analyze/optimize/codegen cost over that nesting
    * grows super-linearly — measured ~17 s of DRIVER time for 12
    * merges at any data size, vs sub-second for depth ≤ 4. Chunking
    * caps the per-plan depth so planning stays linear in |merges|;
    * the per-row work is identical (same fold, same order). Use this
    * from registered queries / anything beyond a handful of merges;
    * the Column form stays the right API inside small expressions.
    *
    * Returns `df` with `outCol` holding the token array. */
  def encodeStaged(df: DataFrame, textCol: String, outCol: String,
                   merges: Seq[(String, String)],
                   chunk: Int = 4): DataFrame = {
    require(chunk >= 1, s"chunk must be >= 1, got $chunk")
    val sym = df.withColumn(outCol, symbolizeWords(col(textCol)))
    val folded = merges.grouped(chunk).foldLeft(sym) { (acc, ms) =>
      acc.withColumn(outCol, mergeFold(col(outCol), ms))
        .localCheckpoint()
    }
    folded.withColumn(outCol, flatten(col(outCol)))
  }
}
