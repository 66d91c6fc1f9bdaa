package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing (extension beyond the reference — SURVEY
  * §7.4): assign documents to fixed token-budget training sequences by
  * the concat-and-chunk rule — lay the corpus out in a deterministic
  * order, concatenate token counts, and cut every `budget` tokens. A
  * document belongs to the sequence where it STARTS (the greedy
  * approximation every packing pipeline ships; bin-perfect packing is
  * NP-hard and order-dependent).
  *
  * Everything is a window cumsum over (group, id) — no driver loop, no
  * RNG — so the layout is reproducible across runs and engines, and a
  * plain SQL window oracle reproduces it exactly.
  *
  * Scale posture: one shuffle keyed on the group column; sequences
  * are numbered within each group so groups pack independently and in
  * parallel. A single giant group would serialize its window into one
  * task — the `shards` dial splits every group into
  * md5-deterministic subshards, trading a little end-of-shard
  * fragmentation for bounded task size (the same determinism contract
  * as [[Curation.deterministicSample]]: layout survives repartitioning
  * and incremental re-runs).
  */
object Packing {

  /** Per-document sequence assignment: (idCol, groupCol, n_tokens,
    * seq_id, seq_offset), where seq_id numbers `budget`-token
    * sequences within the group (plus shard, when sharded) and
    * seq_offset is the document's token offset inside its sequence.
    * Documents longer than `budget` still start somewhere — callers
    * split or drop them upstream (the t9 histogram is the sizing
    * pass). */
  def packSequences(docs: DataFrame, budget: Int,
                    groupCol: String = "lang",
                    textCol: String = "text",
                    idCol: String = "doc_id",
                    shards: Int = 0): DataFrame = {
    require(budget > 0, s"packSequences needs budget > 0, got $budget")
    require(shards >= 0, s"shards must be >= 0, got $shards")
    // Deterministic subshard from the id's md5 (NOT Spark's hash():
    // md5 text is engine-portable, so the oracle reproduces it).
    val shard: Column =
      if (shards == 0) lit(0L)
      else pmod(Curation.slot16(col(idCol)), lit(shards.toLong))
    val w = Window.partitionBy(col(groupCol), col("__shard"))
      .orderBy(col(idCol))
    val withTok = docs
      .select(col(idCol), col(groupCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__shard", shard)
    val start = coalesce(
      sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L))
    // seq_id must identify ONE physical sequence per (group, seq_id):
    // with sharding, each shard numbers its own sequences 0,1,…, so
    // the per-shard index is interleaved with the shard id — without
    // this, `shards` different sequences would share (group, 0) and a
    // consumer would concatenate them into one overlong sequence
    val perShard = floor(start / budget)
    val seqId =
      if (shards == 0) perShard
      else perShard * shards + col("__shard")
    withTok
      .withColumn("seq_id", seqId)
      .withColumn("seq_offset", start - perShard * budget)
      .drop("__shard")
  }

  /** Per-sequence fill report over [[packSequences]] output: how many
    * documents and how many tokens landed in each sequence. The
    * `filled` fraction (tokens that start in the sequence / budget)
    * is the packing-efficiency metric a mix report tracks; it can
    * exceed 1.0 exactly when a document straddles the cut — the
    * documented concat-and-chunk behavior, not a defect. */
  def packStats(packed: DataFrame, budget: Int,
                groupCol: String = "lang"): DataFrame =
    packed.groupBy(col(groupCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        graft.ops.Ops.roundDet(
          sum(col("n_tokens")).cast("double") / budget, 4).as("filled"))
}
