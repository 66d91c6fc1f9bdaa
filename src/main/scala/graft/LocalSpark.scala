package graft

import org.apache.spark.sql.SparkSession

/** Shared local-mode session bootstrap for the runnable mains (C6):
  * `local[SPARK_GRAFT_CPUS]`, shuffle partitions sized to the core
  * count (not the 200 default — pointless task overhead on one box),
  * UTC session time zone (oracle parity), UI off. */
object LocalSpark {
  def session(appName: String, defaultCpus: String = "32",
              extraConf: Map[String, String] = Map.empty): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => builder.config(k, v) }
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
