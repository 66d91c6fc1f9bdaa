package graft.streaming

import org.apache.spark.sql.functions._

/** Store-growth evidence for the takedown pushdown split
  * ([[Takedown.idLiterals]]): a takedown must first discover WHICH
  * batch partitions hold the requested ids and then fetch the
  * matched rows (id + payload) for the index un-mix. The literal
  * posture pushes an IN predicate to the parquet reader, so over the
  * ingests' id-sorted batch files row groups whose id stats exclude
  * the request are skipped without decoding; the semi-join posture
  * decodes the scanned columns for every row before its join can
  * drop them.
  *
  * Measured honestly, both postures are CLOSER than the structural
  * argument suggests on this box: the discovery pass is id+batch
  * only (column-pruned either way — a vectorized long decode at
  * tens of millions of rows hides under job overhead), and for the
  * payload fetch Spark's own runtime bloom-filter injection
  * (InjectRuntimeFilter over the broadcast semi-join) already
  * drops non-matching rows at the scan's filter stage — Catalyst
  * closing most of the gap on its own, which is the "let Catalyst
  * optimize" posture working as designed. The pushdown path's
  * remaining edge is that it skips the DECODE itself (row-group
  * stats, no decompression), which grows with payload width and
  * IO latency — the 100 TB term a local NVMe benchmark
  * under-represents. The probe reports both passes at growing batch
  * counts so the slopes are on record.
  *
  * The probe grows the store's batch count alone (rows per batch
  * fixed, ids disjoint per batch — exactly the ingests' layout) and
  * times both passes for ids that are ABSENT from the store: zero
  * affected partitions, zero rewrites, zero matched rows, so the
  * measured time is the scan and nothing else, idempotent across
  * repeats. Both postures run the identical request — `pushdownCap`
  * default (literal/IN) vs 0 (semi-join fallback).
  *
  * Usage: runMain graft.streaming.TakedownScaleProbe
  *          <repeats> <sfDir> <rowsPerBatch> <batches1> [batches2 …]
  * Output: one JSON line per store size:
  *   {"probe":"takedown_discovery","batches":B,"rows":N,
  *    "pushdown_secs":[…],"semijoin_secs":[…]}
  */
object TakedownScaleProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: TakedownScaleProbe <repeats> <sfDir> <rowsPerBatch> " +
        "<batches1> [...]")
    val repeats = args(0).toInt
    val sfDir = args(1)
    val rowsPerBatch = args(2).toLong
    val sizes = args.drop(3).map(_.toInt).toSeq
    val spark = graft.LocalSpark.session("graft-takedown-scale-probe",
      extraConf = Map("spark.sql.adaptive.enabled" -> "true"))
    spark.range(1000000).selectExpr("sum(id)").collect()
    // text mass from the fixture corpus, recycled by modulo so every
    // batch row carries a realistic payload column
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("k"), col("text")).localCheckpoint()
    val nTexts = texts.count()
    val root0 = java.nio.file.Files
      .createTempDirectory("graft_tkprobe_").toString
    for (batches <- sizes) {
      val root = s"$root0/store_$batches"
      // the ingests' exact layout: one id-sorted dir per batch,
      // disjoint id ranges (batch b holds [b*R, (b+1)*R))
      spark.range(batches.toLong * rowsPerBatch)
        .select(col("id").as("doc_id"),
          (col("id") / rowsPerBatch).cast("long").as("batch"),
          (col("id") % nTexts).as("k"))
        .join(texts, "k")
        .select("doc_id", "text", "batch")
        .repartition(col("batch"))
        .sortWithinPartitions("batch", "doc_id")
        .write.partitionBy("batch").mode("overwrite").parquet(root)
      // absent ids: negative, so both postures discover ZERO affected
      // partitions and the timings are pure scan cost, idempotent
      val ids = spark.range(8)
        .select((-col("id") - 1L).as("doc_id")).localCheckpoint()
      val lits = (1 to 8).map(i => -i.toLong)
      def time(f: => Unit): Seq[Double] = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      // discovery (purgeStore's affected-batch pass): id+batch only,
      // column-pruned on BOTH paths — included for completeness, but
      // a vectorized long-column decode is cheap enough that local
      // NVMe hides the difference; the separator is the FETCH below
      val pushDisc = time(Takedown.purgeStore(spark, root, ids,
        "doc_id", Seq("text")))
      val semiDisc = time(Takedown.purgeStore(spark, root, ids,
        "doc_id", Seq("text"), pushdownCap = 0))
      // retract's row FETCH (id + payload): the semi-join posture
      // decompresses the text column for EVERY row of EVERY batch
      // before the join can drop it; the pushed IN predicate skips
      // whole row groups on id stats, payload never decoded. The
      // length-sum forces the payload through both plans.
      def drain(df: org.apache.spark.sql.DataFrame): Unit = {
        df.agg(sum(length(col("text")))).collect(); ()
      }
      val pushFetch = time(drain(
        spark.read.parquet(root).filter(col("doc_id").isin(lits: _*))
          .select("doc_id", "text")))
      val semiFetch = time(drain(
        spark.read.parquet(root).join(ids, Seq("doc_id"), "left_semi")
          .select("doc_id", "text")))
      def fmt(xs: Seq[Double]) =
        xs.map(s => String.format(java.util.Locale.ROOT, "%.2f",
          Double.box(s))).mkString("[", ",", "]")
      println(s"""{"probe":"takedown_discovery","batches":$batches,""" +
        s""""rows":${batches.toLong * rowsPerBatch},""" +
        s""""pushdown_fetch_secs":${fmt(pushFetch)},""" +
        s""""semijoin_fetch_secs":${fmt(semiFetch)},""" +
        s""""pushdown_discovery_secs":${fmt(pushDisc)},""" +
        s""""semijoin_discovery_secs":${fmt(semiDisc)}}""")
    }
    spark.stop()
  }
}
