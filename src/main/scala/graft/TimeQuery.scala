package graft

/** Dev timing harness: run ONE registered query N times at a given
  * scale dir and print per-rep wall-clock — the single-query
  * counterpart of [[Bench]] for iterating on a plan without paying a
  * full-registry run. Usage:
  * `sbt "runMain graft.TimeQuery c1_decontaminate /root/testdata/sf0.1 3"`.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = LocalSpark.session("graft-time",
      extraConf = Map("spark.sql.adaptive.enabled" -> "true"))
    spark.range(1000000).selectExpr("sum(id)").collect() // codegen warmup
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; see SparkEntry.queries.keys"))
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      System.out.println(
        f"TIMEQ $name rep=$i rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
