package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set curation operators (extension beyond the reference —
  * SURVEY §7.4): deterministic subsampling, per-group balancing and
  * distribution profiling. These are the selection passes that run
  * AFTER cleaning/dedup ([[CorpusPipeline]]) to shape what actually
  * enters a training mix.
  *
  * Scale posture: sampling is a per-row predicate (no shuffle, no
  * RNG state — rides the scan); balancing shuffles once on the group
  * key with per-group state bounded by the cap k; the histogram is a
  * partial+final aggregate on a bounded bin space.
  */
object Curation {

  /** Deterministic hash sample: keep a row iff the first two hex
    * digits of md5(key) fall below `hexBound`. Unlike `rand()`-based
    * sampling this is (a) reproducible across runs, engines and
    * cluster layouts, (b) stable under re-partitioning, and (c)
    * consistent — the same key set is chosen when the corpus is
    * re-read or incrementally extended, which is what makes held-out
    * splits and A/B corpus diffs possible at 100 TB. The rate is
    * hexBound/256 (two hex digits), e.g. "1a" → 26/256 ≈ 10.2%.
    * md5 is the engine-portable choice (same lowercase hex text in
    * Spark, DuckDB, Postgres), and the reference already leans on it
    * for fingerprints ([[TextAnalysis.fingerprint]]).
    */
  def deterministicSample(df: DataFrame, keyCol: String,
                          hexBound: String = "1a"): DataFrame = {
    require(hexBound.matches("[0-9a-f]{2}"),
      s"hexBound must be two lowercase hex digits, got '$hexBound'")
    df.filter(substring(md5(col(keyCol).cast("string")), 1, 2) < hexBound)
  }

  /** Per-group cap: the top k rows of each group under `order`
    * (callers append a unique id to make the order total — otherwise
    * rank at the cut boundary is nondeterministic). The standard
    * class-balancing pass: cap every language/source/domain at k
    * best-quality documents so one crawl domain cannot dominate the
    * mix. One shuffle keyed on the group column; window state is one
    * counter per group. Emits `rank` (1-based position within the
    * group). */
  def balancedTopK(df: DataFrame, groupCol: String, k: Int,
                   order: Column*): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Fixed-width histogram of an integer metric: bin = value rounded
    * down to a multiple of `width`. Partial+final aggregate over at
    * most (max/width) bins — the distribution-profiling pass (token
    * budget per document, chars per document) that sizes a training
    * mix before sampling it. */
  def histogram(df: DataFrame, metric: Column, width: Int): DataFrame = {
    require(width > 0, s"histogram width must be positive, got $width")
    val v = metric.cast("long")
    df.select((v - pmod(v, lit(width.toLong))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }
}
