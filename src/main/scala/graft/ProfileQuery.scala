package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev profiling harness: run ONE registered query and attribute
  * wall-clock to Spark JOBS by call site (the default job description
  * is the action's call site, e.g. "count at DedupIndex.scala:249"),
  * plus per-stage shuffle bytes — the §1 "measure first" loop for the
  * protocol rows, whose cost is spread over dozens of small jobs that
  * a single explain() cannot attribute. Usage:
  * `sbt "runMain graft.ProfileQuery st24_ingest_kmv_gauge /root/testdata/sf0.1"`.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    // PROFILE_AQE=false isolates AQE's per-action planning share
    // (the bench itself always runs AQE on)
    val spark = LocalSpark.session("graft-profile",
      extraConf = Map("spark.sql.adaptive.enabled" ->
        sys.env.getOrElse("PROFILE_AQE", "true")))
    spark.range(1000000).selectExpr("sum(id)").collect() // codegen warmup

    val jobStart = mutable.Map[Int, (Long, String)]()
    val bySite = mutable.LinkedHashMap[String, (Int, Double)]()
    var shuffleRead = 0L
    var shuffleWrite = 0L
    var nStages = 0
    var nTasks = 0
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart.synchronized {
          // callSite.short is absent on SQL-execution jobs; the last
          // stage's name carries the action's call site instead
          val site = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .orElse(e.stageInfos.lastOption.map(_.name))
            .getOrElse("?")
          jobStart(e.jobId) = (System.nanoTime(), site)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.synchronized {
          jobStart.remove(e.jobId).foreach { case (t0, site) =>
            val secs = (System.nanoTime() - t0) / 1e9
            val (n, s) = bySite.getOrElse(site, (0, 0.0))
            bySite(site) = (n + 1, s + secs)
          }
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        nStages += 1
        nTasks += e.stageInfo.numTasks
        shuffleRead += e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleWrite += e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))

    // sample every live thread ~every 25 ms and histogram the deepest
    // graft frame (and the top spark frame under it) — attributes the
    // driver-side time BETWEEN jobs that the job listener cannot see
    val samples = mutable.Map[String, Int]()
    @volatile var sampling = true
    val mainThread = Thread.currentThread()
    val sampler = new Thread(() => {
      // getAllStackTraces across a threaded Spark driver is expensive
      // enough to distort the measurement — cache the interesting
      // thread and only re-scan for a stream-execution thread when
      // the main thread is parked in awaitTermination
      var streamThread: Option[Thread] = None
      while (sampling) {
        import scala.jdk.CollectionConverters._
        val mainSt = mainThread.getStackTrace
        val st =
          if (mainSt.exists(_.getMethodName == "awaitTermination")) {
            if (streamThread.isEmpty || !streamThread.get.isAlive)
              streamThread = Thread.getAllStackTraces.asScala.keys
                .find(t => t.isAlive &&
                  t.getName.contains("stream execution thread"))
            streamThread.map(_.getStackTrace).getOrElse(mainSt)
          } else mainSt
        val graftFrame = st.find(f =>
          f.getClassName.startsWith("graft.") &&
            !f.getClassName.contains("ProfileQuery"))
        val sparkTop = st.find(f =>
          f.getClassName.startsWith("org.apache.spark."))
        val key = graftFrame.map(f =>
            s"${f.getFileName}:${f.getLineNumber} " +
              f.getMethodName).getOrElse("(no graft frame)") +
          sparkTop.map(f => "  <- " + f.getClassName.split("\\.").last +
            "." + f.getMethodName).getOrElse("")
        samples.synchronized {
          samples(key) = samples.getOrElse(key, 0) + 1
        }
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    sampling = false
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // let the listener bus drain
    val nJobs = bySite.values.map(_._1).sum
    val jobSecs = bySite.values.map(_._2).sum
    println(f"PROFILE $name rows=$n total=$total%.2fs jobs=$nJobs " +
      f"jobSecs=$jobSecs%.2f stages=$nStages tasks=$nTasks " +
      f"shufRead=${shuffleRead / 1e6}%.1fMB shufWrite=${shuffleWrite / 1e6}%.1fMB")
    bySite.toSeq.sortBy(-_._2._2).take(40).foreach { case (site, (c, s)) =>
      println(f"PROFILE   $s%8.2fs  n=$c%-4d $site")
    }
    val totSamples = samples.values.sum.max(1)
    println(s"PROFILE driver-thread samples ($totSamples):")
    samples.toSeq.sortBy(-_._2).take(40).foreach { case (k, c) =>
      println(f"PROFILE   ${c * 100.0 / totSamples}%5.1f%% n=$c%-5d $k")
    }
    spark.stop()
  }
}
