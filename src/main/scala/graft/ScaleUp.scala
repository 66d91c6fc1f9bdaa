package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up fixture generator: writes an N× replica of a testdata
  * scale-factor directory by unioning N key-shifted copies of each
  * keyed table (dims are copied as-is — they are the broadcast sides
  * and FK targets at every scale). Used to measure how each registered
  * query's wall-clock scales in rows beyond the largest shipped
  * fixture (SCALING.md records the ratios).
  *
  * Key discipline: every primary key is shifted by copy · (max+1) of
  * its own key space, and every foreign key by the SAME stride as the
  * key it references (events.user_id references the customer key space
  * through the as-of join, so it shifts with c_custkey) — joins match
  * within a copy exactly as they did in the original.
  *
  * Replication is EXACT for text/embedding payloads, deliberately:
  * every document/vector gains N−1 identical twins, which multiplies
  * the true near-duplicate pair mass ~N² — the boilerplate-heavy
  * worst case for the dedup/similarity families (a web corpus where
  * every page has mirror copies), not an accident. Row-linear
  * operators must stay ~linear; pair-emitting sketches are expected
  * super-linear in wall-clock because their OUTPUT is super-linear.
  *
  * `events.ts` is written in whatever physical form the source
  * fixture carries (raw nanosecond longs under nanosAsLong for the
  * TIMESTAMP(NANOS) generation; TIMESTAMP_NTZ for the microsecond
  * one) — either way the replica round-trips through the same
  * type-adaptive [[graft.queries.Q.t]] read path as the shipped
  * fixtures.
  *
  * Layout matters: each table is written as ONE PLAIN FILE
  * `<dst>/<name>.parquet` — the shipped fixtures' layout — because the
  * streaming queries glob for that exact file name under the sf dir
  * (a directory-per-table replica silently matches zero files there).
  * Scan parallelism is unaffected: Spark splits a single parquet file
  * by row group.
  */
object ScaleUp {

  private val Dims = Seq("region", "nation", "supplier", "part")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sfsynth")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = LocalSpark.session("graft-scaleup")
    // read TIMESTAMP(NANOS) as raw longs so the replica round-trips
    // byte-identical through the Q.t read path
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // write as a single plain file (fixture layout, see scaladoc):
    // one-file directory write, then promote the part file
    def write(df: DataFrame, name: String): Unit = {
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(conf)
      val tmp = new org.apache.hadoop.fs.Path(s"$dst/_tmp_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(_.getName.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
      val target = new org.apache.hadoop.fs.Path(s"$dst/$name.parquet")
      fs.delete(target, true)
      if (!fs.rename(part, target))
        throw new IllegalStateException(s"rename $part -> $target failed")
      fs.delete(tmp, true)
    }

    Dims.foreach { d =>
      write(spark.read.parquet(s"$src/$d.parquet"), d)
    }

    def stride(name: String, key: String): Long =
      spark.read.parquet(s"$src/$name.parquet")
        .agg(max(col(key))).head.getLong(0) + 1L

    val cMax = stride("customer", "c_custkey")
    val oMax = stride("orders", "o_orderkey")
    val eMax = stride("events", "event_id")
    val dMax = stride("documents", "doc_id")
    val vMax = stride("embeddings", "vec_id")

    /** N copies with each listed key column shifted by copy·stride. */
    def replicate(name: String, shifts: (String, Long)*): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val parts = (0 until copies).map { i =>
        shifts.foldLeft(base) { case (df, (k, s)) =>
          df.withColumn(k, col(k) + lit(i * s))
        }
      }
      write(parts.reduce(_ unionByName _), name)
    }

    replicate("customer", "c_custkey" -> cMax)
    replicate("orders", "o_orderkey" -> oMax, "o_custkey" -> cMax)
    replicate("lineitem", "l_orderkey" -> oMax)
    replicate("events", "event_id" -> eMax, "user_id" -> cMax)
    replicate("documents", "doc_id" -> dMax)
    replicate("embeddings", "vec_id" -> vMax)

    println(s"scaled $src x$copies -> $dst")
    spark.stop()
  }
}
