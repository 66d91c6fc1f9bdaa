package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep a gold aggregate table
  * current by merging in each new batch's partial aggregates instead
  * of re-scanning all of history (the reference recomputes its gold
  * views from the full silver table every run,
  * src/sql/gold_aggregate_layer.sql; fine at its scale, a full-history
  * scan per refresh at 100 TB).
  *
  * The contract that makes the merge exact:
  *
  *  - stored state is the MONOID form — (count, exact decimal sum)
  *    per group — never the presentation form. Counts and exact sums
  *    are associative+commutative, so batch boundaries cannot change
  *    the result; 2dp-rounded doubles are NOT associative (round(a)+
  *    round(b) ≠ round(a+b)), and averages are not mergeable at all.
  *  - presentation (rounding via [[Ops.roundDet]], avg = s/n) happens
  *    only at read time, in [[finish]].
  *
  * Each refresh costs one aggregation of the BATCH (small) plus one
  * group-keyed merge of two aggregate-table-sized frames — nothing
  * scans history. The merge shuffle is keyed on the group columns,
  * whose cardinality is the aggregate table's, not the fact's.
  */
object DeltaAgg {

  /** A batch reduced to mergeable state: (keys..., n, nv, s) — row
    * count, NON-NULL value count, and the exact DECIMAL(28,10) sum of
    * `valueCol` (the [[Ops.sumMoney]] accumulator type,
    * pre-rounding). `nv` is carried separately because SQL AVG (and
    * [[Ops.avgMoney]]) divide by the non-null count, not the row
    * count — with nullable measures the two differ, and the average
    * must stay mergeable without revisiting history. */
  def partialSums(batch: DataFrame, keys: Seq[String],
                  valueCol: Column): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count(valueCol).as("nv"),
        sum(valueCol.cast("decimal(28,10)")).as("s"))

  /** Merge stored state with a new batch's partial state: union +
    * re-aggregate — Spark's partial/final aggregation handles the
    * combine map-side. */
  def merge(stored: DataFrame, batchPartial: DataFrame,
            keys: Seq[String]): DataFrame =
    stored.unionByName(batchPartial)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("nv")).as("nv"),
        sum(col("s")).as("s"))

  /** Presentation read: rounded sum and derived average, the
    * [[Ops.sumMoney]]/[[Ops.avgMoney]] emission contract (avg divides
    * by the non-null count; NULL when the group has no values). */
  def finish(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("n"),
      Ops.roundDet(col("s").cast("double"), 2).as("total"),
      Ops.roundDet(col("s").cast("double") /
        when(col("nv") > 0, col("nv")), 2).as("avg")): _*)
}
