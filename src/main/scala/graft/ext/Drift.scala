package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Ops

/** Distribution-drift monitoring: Population Stability Index between
  * a reference corpus snapshot and a candidate batch — the gate that
  * catches "the new crawl slice looks nothing like what we trained
  * on" BEFORE the batch is admitted (the drift complement of
  * [[graft.ops.Expectations]]' row-level rules).
  *
  * PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i), p = reference bin share,
  * q = candidate bin share; missing bins are floored at `eps` (the
  * standard clamp — a bin present on one side only is maximal
  * evidence of drift, not a division error). Rule of thumb:
  * < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action.
  *
  * Scale posture: each side reduces to (bin, count) with one
  * partial+final aggregate — the only shuffles are keyed on the
  * bounded bin space, the join of the two bin tables is bin-count
  * sized (config-small), and nothing downstream grows with corpus
  * size. Deterministic double math (fixed operation order, rounded
  * via [[Ops.roundDet]]) so the report oracle-compares exactly.
  */
object Drift {

  /** Per-bin PSI report: (bin, p_ref, p_cand, psi_term), ordered by
    * bin; total PSI is the sum of psi_term. `metric` must be an
    * integer-valued column expression; bins are `width`-wide with
    * FLOOR semantics (pmod): −50 at width 100 lands in bin −100, not
    * 0 — mirror any SQL twin with `x - ((x % w + w) % w)`, since bare
    * `%` follows the dividend's sign and would bin negatives
    * differently. */
  def psiBinned(reference: DataFrame, candidate: DataFrame,
                metric: Column, width: Int,
                eps: Double = 1e-4): DataFrame = {
    require(width > 0, s"bin width must be positive, got $width")
    require(eps > 0, s"eps must be positive, got $eps")
    def bins(df: DataFrame, share: String): DataFrame = {
      val v = metric.cast("long")
      val binned = df.select((v - pmod(v, lit(width.toLong))).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("__n"))
      // window-free share: the bin table is bounded, one more
      // single-row aggregate joins the total back as a literal-sized
      // broadcast (crossJoin of 1 row)
      val total = binned.agg(sum(col("__n")).as("__t"))
      binned.crossJoin(broadcast(total))
        .select(col("bin"),
          (col("__n").cast("double") / col("__t").cast("double")).as(share))
    }
    val p = bins(reference, "p_ref")
    val q = bins(candidate, "p_cand")
    val eps_ = lit(eps)
    p.join(q, Seq("bin"), "full_outer")
      .select(col("bin"),
        Ops.roundDet(coalesce(col("p_ref"), lit(0.0)), 6).as("p_ref"),
        Ops.roundDet(coalesce(col("p_cand"), lit(0.0)), 6).as("p_cand"),
        greatest(coalesce(col("p_ref"), lit(0.0)), eps_).as("__p"),
        greatest(coalesce(col("p_cand"), lit(0.0)), eps_).as("__q"))
      .withColumn("psi_term",
        Ops.roundDet((col("__p") - col("__q")) * log(col("__p") / col("__q")), 4))
      .select("bin", "p_ref", "p_cand", "psi_term")
      .orderBy("bin")
  }
}
