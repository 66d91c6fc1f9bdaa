package graft


/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Queries run in sorted-name order after a small untimed warm-up
  * (session init, codegen compiler, parquet footer caches), so
  * per-query numbers measure the query, not JVM cold start.
  *
  * Besides timings the line carries a per-query physical-plan DIGEST
  * (stable hash of the formatted plan with expression ids and file
  * paths normalized away), and the full formatted plans go to
  * BENCH_PLANS.txt — so a timing swing between rounds is attributable:
  * same digest = same plan = environmental noise; changed digest = a
  * real plan regression/improvement to audit.
  */
object Bench {

  /** Strip run-variant noise from a formatted plan so the digest is
    * stable across runs/scale factors: expression ids (#123), codegen
    * stage ids, plan ids, file paths/locations, row-count stats. */
  private[graft] def normalizePlan(plan: String): String =
    plan
      .replaceAll("#\\d+", "#")
      .replaceAll("\\[codegen id : \\d+\\]", "")
      .replaceAll("\\[plan_id=\\d+\\]", "")
      .replaceAll("(?i)location:? [^\\n]*", "location: _")
      .replaceAll("file:[^\\s,\\)\\]]+", "file:_")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics(_)")
      .replaceAll("0x[0-9A-Fa-f]{64,}", "0x_") // giant binary literals
      // synthetic lambda identities (MapPartitions closures) embed a
      // per-JVM class counter + object hash — pure run noise
      .replaceAll("Lambda\\$\\d+/0x[0-9a-fA-F]+@[0-9a-f]+", "Lambda\\$_")
      // localCheckpoint scans print the RDD's per-JVM id counter
      .replaceAll("RDD\\[\\d+\\]", "RDD[_]")
      // plain object identities (udaf Aggregator instances print as
      // graft.ops.TopKAgg@3a04a5f7) — per-JVM hash, pure run noise
      .replaceAll("@[0-9a-f]{6,}", "@_")
      // RDD creation-site line numbers (… at localCheckpoint at
      // Dedup.scala:507): stable across runs but NOT across unrelated
      // edits to the same source file — an insertion above the call
      // would re-digest every checkpoint-bearing plan in the file
      .replaceAll("\\.scala:\\d+", ".scala:_")
      // HOF lambda variables print as `lambda x_6#` — the 6 is a
      // per-JVM NamedLambdaVariable counter embedded in the NAME, so
      // it survives the #\d+ exprId rule and shifts with the number
      // of HOF plans built earlier in the session. Same-plan digests
      // matched across Bench sweeps only because sorted-name order
      // made the counters line up; any other execution order (e.g.
      // ScalingProbe on a subset) re-digested every HOF-bearing plan.
      .replaceAll("\\blambda ([A-Za-z0-9]+)_\\d+#", "lambda $1_#")

  /** Escape non-printable characters (e.g. the \u0001 field
    * separators some expressions carry as string literals) so the
    * plans file stays text. */
  private def printable(s: String): String =
    s.flatMap {
      case c if c >= ' ' || c == '\n' || c == '\t' => c.toString
      case c => f"\\u${c.toInt}%04x"
    }

  /** Shorten giant inline binary literals (e.g. a broadcast Bloom
    * filter's bytes) for the human-readable plans file — a 1 MiB
    * filter would otherwise dump 2 MiB of hex per plan occurrence. */
  private[graft] def compactPlan(plan: String): String =
    printable("0x[0-9A-Fa-f]{64,}".r.replaceAllIn(plan,
      m => s"${m.matched.take(18)}…(${m.matched.length - 2} hex chars)"))

  private[graft] def digest(plan: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(normalizePlan(plan).getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
  }

  /** Locale-fixed 3dp formatter: the f"" interpolator uses the JVM
    * default locale, which in a comma-decimal locale (de_DE) would
    * print "0,123" and break the machine-parsed JSON line. */
  private[graft] def fmt3(v: Double): String =
    java.lang.String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSpark.session("graft-bench",
      extraConf = Map("spark.sql.adaptive.enabled" -> "true"))

    // untimed warm-up: JIT/codegen + file listing
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val plans = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val secs = try {
          val df = fn(spark, sfDir)
          df.count()
          val s = (System.nanoTime() - t0) / 1e9
          try {
            plans(name) = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          } catch { case e: Throwable =>
            System.err.println(s"bench: no plan for $name: $e") }
          s
        } catch {
          case e: Throwable =>
            // a failed query must be loud AND carry a sentinel time:
            // consumers reading only the timing fields must not see a
            // plausible wall-clock for a query that produced nothing
            System.err.println(s"BENCH QUERY FAILED: $name: $e")
            // strip quote/backslash and ALL control chars — a tab or
            // CR in an exception message must not break the JSON line
            errors(name) = e.toString.take(200)
              .replaceAll("[\"\\\\\\p{Cntrl}]", " ")
            -1.0
        }
        name -> secs
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // compact per-query map for the stdout line: 3dp is plenty for a
    // wall-clock second and keeps 139 entries ~3 KB, not ~10
    val qsCompact = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (v < 0) "-1.0" else fmt3(v))
    }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val digests = plans.map { case (k, v) => "\"" + k + "\":\"" + digest(v) + "\"" }
      .mkString("{", ",", "}")
    // failed queries (sentinel -1) do not count into the total
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"plans":$digests,"sf":"$sfDir"}"""
    // two stdout payloads. The FINAL line is a ~150-byte SUMMARY that
    // always fits any tail capture (rounds 5 AND 6 proved that even a
    // ~3.5 KB per-query line overflows the driver's capture window —
    // BENCH_r06.json's tail opened mid-payload). The full compact
    // per-query map goes one line EARLIER plus into BENCH.json.
    val lineCompact =
      s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":$qsCompact,"errors":$errs,"sf":"$sfDir"}"""
    // the summary's error field is NAMES ONLY, capped — full messages
    // (≤200 chars each) would re-overflow the tail exactly when many
    // queries fail, i.e. when the signal matters most; messages live
    // in the compact line and BENCH.json
    val failedNames = errors.keys.take(8)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val lineSummary =
      s"""{"metric":"total","value":${fmt3(total)},"unit":"sec",""" +
        s""""n_queries":${results.size},"n_failed":${errors.size},""" +
        s""""failed":$failedNames,"sf":"$sfDir"}"""
    // the bare line also goes to known file paths (BENCH.json is
    // gitignored; see .gitignore) — belt and braces for any consumer
    // whose stdout capture is decorated by the build tool
    for (p <- Seq(sys.env.get("SPARK_GRAFT_BENCH_OUT"),
                  Some("BENCH.json")).flatten.distinct) {
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          (line + "\n").getBytes("UTF-8"))
      } catch { case e: Throwable =>
        System.err.println(s"bench: could not write $p: $e") }
    }
    // full formatted plans, digest-tagged, for plan-level audits —
    // dumped NORMALIZED (the digest's own id/path scrubbing): raw
    // expression ids are session-monotonic counters, so a raw dump
    // re-renumbers every plan whenever any earlier query changes
    // (~45k diff lines/round burying the real digest changes); the
    // normalized text diffs only where a plan genuinely changed,
    // while pushdowns/join strategies/codegen spans stay legible
    val plansOut = sys.env.getOrElse("SPARK_GRAFT_PLANS_OUT", "BENCH_PLANS.txt")
    try {
      val body = plans.map { case (k, v) =>
        s"==== $k [${digest(v)}] ====\n${compactPlan(normalizePlan(v))}"
      }.mkString("\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(plansOut),
        body.getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"bench: could not write $plansOut: $e") }
    spark.stop()
    // stdout contract (after spark.stop()'s shutdown chatter, which
    // goes to stderr): second-to-last line = compact per-query map;
    // FINAL line = tiny summary that fits ANY tail capture. build.sbt
    // sets run/outputStrategy := StdoutOutput so sbt passes both
    // through un-prefixed. Full payload (plan digests) is BENCH.json.
    println(lineCompact)
    println(lineSummary)
    System.out.flush()
  }
}
