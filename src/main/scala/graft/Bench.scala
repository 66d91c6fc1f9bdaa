package graft


/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Queries run in sorted-name order after a small untimed warm-up
  * (session init, codegen compiler, parquet footer caches), so
  * per-query numbers measure the query, not JVM cold start.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSpark.session("graft-bench",
      extraConf = Map("spark.sql.adaptive.enabled" -> "true"))

    // untimed warm-up: JIT/codegen + file listing
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            // a failed query must be loud, not a suspiciously fast time
            System.err.println(s"BENCH QUERY FAILED: $name: $e")
            // strip quote/backslash and ALL control chars — a tab or
            // CR in an exception message must not break the JSON line
            errors(name) = e.toString.take(200)
              .replaceAll("[\"\\\\\\p{Cntrl}]", " ")
        }
        name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // sbt prefixes stdout with [info], which broke the driver's JSON
    // parse in round 1 — also write the bare line to known file paths
    for (p <- Seq(sys.env.get("SPARK_GRAFT_BENCH_OUT"),
                  Some("BENCH.json")).flatten.distinct) {
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          (line + "\n").getBytes("UTF-8"))
      } catch { case e: Throwable =>
        System.err.println(s"bench: could not write $p: $e") }
    }
    spark.stop()
  }
}
