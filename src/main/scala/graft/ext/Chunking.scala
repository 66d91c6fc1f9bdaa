package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into overlapping
  * token windows — the standard prep step between a cleaned corpus
  * and sequence packing ([[Packing.packSequences]] budgets whole
  * texts; training pipelines first chunk long documents so no single
  * text overflows the model context, then pack the chunks).
  *
  * Whitespace tokens are the engine-portable stand-in for a real
  * tokenizer (same contract as [[TextAnalysis.tokens]]); the window
  * arithmetic — stride, overlap, tail handling — is tokenizer-
  * independent and is what this operator owns.
  *
  * Scale posture: pure narrow map + explode, no shuffle at all — the
  * chunk stream rides the scan partitioning, so at 100 TB this is
  * embarrassingly parallel. Output volume is input tokens ×
  * size/(size−overlap); the overlap factor is the caller's knob, and
  * [[chunk]] refuses degenerate configurations (overlap ≥ size) that
  * would make the explode quadratic.
  */
object Chunking {

  /** Explode each document into token windows of `size` tokens
    * advancing by `size − overlap`: starts 0, s, 2s, … while the
    * window still covers at least one NEW token (start < n − overlap,
    * plus start 0), so the tail chunk may be short but no token is
    * dropped AND no chunk is a pure suffix of its predecessor — a
    * start inside the previous window's overlap region would re-emit
    * already-covered tokens as a fully redundant training row.
    * Emits (id, chunk_id, chunk_text, n_chunk_tokens); chunk_id is
    * the 0-based window index within its document.
    */
  def chunk(docs: DataFrame, size: Int, overlap: Int,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val step = size - overlap
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("__start",
        explode(sequence(lit(0),
          greatest(col("__n") - overlap - 1, lit(0)), lit(step))))
      .select(
        col(idCol),
        (col("__start").cast("long") / step).cast("bigint").as("chunk_id"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(size)), " ")
          .as("chunk_text"),
        least(lit(size), col("__n") - col("__start")).cast("bigint")
          .as("n_chunk_tokens"))
  }
}
