package graft

import org.apache.spark.sql.functions._

/** Depth-scaling evidence for the quarantine anti-join (p7/p8): the
  * reference's pathology grew with HISTORY LENGTH (months of
  * accumulated invalid_records — its proc re-joined all of them per
  * batch, 3.2 s → 83.5 s over twelve months, BASELINE.md), not with
  * rows per month. The SCALING.md sweep grows rows ~uniformly, so it
  * cannot isolate that axis; this probe grows the MONTH COUNT alone:
  * the store is built from `copies` date-shifted replicas of orders
  * (copy k shifted by k·81 months — disjoint month ranges, so rows
  * per month stay EXACTLY the original), and the probe anti-joins
  * the same single-month candidate batch at every depth. A
  * partition-pruned probe must stay flat from 80 to 800 months;
  * anything that grows with depth would be reading history it
  * should have pruned.
  *
  * Usage: runMain graft.QuarantineDepthProbe <repeats> <sfDir>
  *          <copies1> [copies2 ...]
  * Output: one JSON line per depth:
  *   {"probe":"quarantine_depth","copies":10,"months":800,"secs":[…]}
  */
object QuarantineDepthProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: QuarantineDepthProbe <repeats> <sfDir> <copies1> [...]")
    val repeats = args(0).toInt
    val sfDir = args(1)
    val depths = args.drop(2).map(_.toInt).toSeq
    val spark = LocalSpark.session("graft-quarantine-depth-probe",
      extraConf = Map("spark.sql.adaptive.enabled" -> "true"))
    spark.range(1000000).selectExpr("sum(id)").collect()
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    for (copies <- depths) {
      val dir =
        graft.ops.QuarantineStore.dirFor(sfDir) + s"_depth$copies"
      val deep = (0 until copies).map(k =>
        orders.withColumn("o_orderdate",
          add_months(col("o_orderdate"), k * 81)))
        .reduce(_ unionByName _)
      graft.ops.QuarantineStore.build(deep, dir)
      val months = spark.read.parquet(dir)
        .select("order_month").distinct().count()
      // both postures: the registered PartitionFilters probe (data
      // pruned, root listing still O(months) — metastore-served in a
      // catalog deployment) and the direct-partition read (zero
      // listing — the bare-object-store equivalent)
      def time(f: => Long): Seq[Double] = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      val pf = time(
        graft.ops.QuarantineStore.probe(spark, dir, orders).count())
      val direct = time(
        graft.ops.QuarantineStore.probeDirect(spark, dir, orders)
          .count())
      def fmt(xs: Seq[Double]) =
        xs.map(s => String.format(java.util.Locale.ROOT, "%.2f",
          Double.box(s))).mkString("[", ",", "]")
      println(s"""{"probe":"quarantine_depth","copies":$copies,""" +
        s""""months":$months,"probe_secs":${fmt(pf)},""" +
        s""""direct_secs":${fmt(direct)}}""")
    }
    spark.stop()
  }
}
