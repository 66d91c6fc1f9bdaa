package graft

/** Repeat-timing probe for individual registered queries across scale
  * directories — the evidence tool behind SCALING.md's "is this growth
  * real or box load?" calls.
  *
  * The three-sf sweep in SCALING.md is single-run per regime on a
  * shared box where 2-5× load swings were observed; before believing
  * any per-query growth ratio, the Method section requires (a) the
  * plan digest to be identical across regimes (same plan, so any
  * swing is environment) and (b) a repeated timing to bound the
  * run-to-run spread. `graft.Bench` produces (a) for the whole
  * registry; this main produces both for a handful of named queries
  * without paying for a full sweep.
  *
  * Usage: runMain graft.ScalingProbe <repeats> <q1,q2,...> <dir1> [dir2 ...]
  *
  * For each (query, dir) it builds a FRESH DataFrame per repetition
  * (so codegen/file-listing caches warm exactly as in Bench after its
  * warm-up) and times `df.count()`. Output: one human table plus one
  * machine-readable JSON line per (query, dir):
  *   {"probe":"t15_bigram_xent","dir":"…","digest":"…","secs":[…]}
  */
object ScalingProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ScalingProbe <repeats> <q1,q2,...> <dir1> [dir2 ...]")
    val repeats = args(0).toInt
    val names = args(1).split(",").toSeq
    val dirs = args.drop(2).toSeq

    val spark = LocalSpark.session("graft-scaling-probe",
      extraConf = Map("spark.sql.adaptive.enabled" -> "true"))
    // same untimed warm-up as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()

    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    for (dir <- dirs) {
      spark.read.parquet(s"$dir/lineitem.parquet").limit(10).count()
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        val secs = (1 to repeats).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val digest = Bench.digest(plan)
        // optional: dump the NORMALIZED plan per (query, dir) so a
        // cross-regime digest difference can be diffed to its cause
        sys.env.get("SPARK_GRAFT_PROBE_PLAN_DIR").foreach { pd =>
          val safe = dir.replaceAll("[^A-Za-z0-9.]", "_")
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pd))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$pd/${name}__$safe.txt"),
            Bench.normalizePlan(plan).getBytes("UTF-8"))
        }
        val times = secs.map(s => f"$s%.2f").mkString("[", ",", "]")
        println(s"""{"probe":"$name","dir":"$dir","digest":"$digest","secs":$times}""")
      }
    }
    spark.stop()
  }
}
