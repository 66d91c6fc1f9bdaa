package graft

import org.apache.spark.sql.functions._

/** Evidence probe for [[graft.ext.Similarity.centroids]]' maxCentroids
  * cap: times one full [[graft.ext.Similarity.ivfAssign]] pass over
  * in-memory key-shifted replicas of the sf0.1 embeddings corpus, with
  * the cap on (default 4096) and off (Int.MaxValue), at corpus sizes
  * straddling the point where the cap binds (stride 20 × 4096 =
  * 81 920 ids). Uncapped, assign cost is O(N·K) = O(N²/stride) — each
  * doubling of the corpus quadruples the work; capped, K pins at
  * ≤ 4096 and the pass is linear in N. The probe prints one JSON line
  * per (copies, mode) with the centroid count and repeat timings, the
  * same evidence format as [[ScalingProbe]].
  *
  * Usage: runMain graft.CentroidCapProbe [repeats] [srcDir]
  */
object CentroidCapProbe {

  def main(args: Array[String]): Unit = {
    val repeats = args.lift(0).map(_.toInt).getOrElse(3)
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = LocalSpark.session("graft-centroid-cap-probe",
      extraConf = Map("spark.sql.adaptive.enabled" -> "true"))
    spark.range(1000000).selectExpr("sum(id)").collect()

    val base = spark.read.parquet(s"$src/embeddings.parquet")
      .select("vec_id", "embedding")
    val strideIds = base.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val baseRows = base.count()

    // copies chosen to straddle the cap: 40× of sf0.1 (80 000 ids) is
    // the last uncapped size; 80× and 160× bind the cap (stride widens
    // 20 → 40 → 79)
    for (copies <- Seq(40, 80, 160)) {
      val corpus = spark.range(copies).select(col("id").as("__c"))
        .join(base)
        .select((col("vec_id") + col("__c") * strideIds).as("vec_id"),
          col("embedding"))
        .repartition(32).localCheckpoint() // materialize: time assign, not the replicate
      for ((mode, cap) <- Seq("capped" -> 4096, "uncapped" -> Int.MaxValue)) {
        // uncapped at 160× is the demonstrated quadratic cliff — skip
        // it so the probe terminates in bounded time; the 40→80 pair
        // already shows the 4× step
        if (!(mode == "uncapped" && copies > 80)) {
          // hoist the centroid frame out of the timed loop so only the
          // assign pass (the O(N·K) cost under probe) is measured
          val cents = graft.ext.Similarity.centroids(corpus, stride = 20,
            maxCentroids = cap).localCheckpoint()
          val k = cents.count()
          val secs = (1 to repeats).map { _ =>
            val t0 = System.nanoTime()
            graft.ext.Similarity.ivfAssign(corpus, cents)
              .agg(count(lit(1)), max(col("cid"))).collect()
            (System.nanoTime() - t0) / 1e9
          }
          val times = secs.map(s => java.lang.String.format(
            java.util.Locale.ROOT, "%.2f", Double.box(s)))
            .mkString("[", ",", "]")
          println(s"""{"probe":"centroid_cap","copies":$copies,""" +
            s""""rows":${baseRows * copies},"mode":"$mode",""" +
            s""""centroids":$k,"secs":$times}""")
        }
      }
    }
    spark.stop()
  }
}
