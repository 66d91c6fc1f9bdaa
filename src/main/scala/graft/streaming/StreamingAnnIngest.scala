package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType,
  StructField, StructType}

import graft.ext.AnnIndex

/** Continuous ANN-index ingestion: a file-source stream watches a
  * staging directory for embedding parquet drops and maintains a
  * stored [[AnnIndex]] through `foreachBatch` — first batch builds
  * the index, every later batch flows through [[AnnIndex.append]]
  * (encode/assign against the STORED assets, O(batch) meta update).
  * The embedding-pipeline sibling of [[StreamingBronzeIngest]], and
  * the production shape for "index the new documents as they land":
  * `Trigger.AvailableNow` processes everything staged then stops; a
  * processing-time trigger turns the same code into a service.
  *
  * Idempotency layering, matching the bronze ingest's C4 discipline:
  * checkpointing makes restarts exactly-once at the MICRO-BATCH
  * level, and the explicit already-indexed anti-join (the d7
  * incremental-dedup gate, keyed on the compact postings' nid
  * column, never the vectors) makes re-delivered ROWS a no-op —
  * append's own duplicate-id guard is disabled because this gate
  * subsumes it (the guard throws on overlap; at-least-once delivery
  * wants overlap silently skipped instead). A crash between the
  * postings append and the meta write leaves a validation-failing
  * index (no meta — the commit-marker invariant), and the batch
  * replays into a rebuild on restart.
  */
final class StreamingAnnIngest(spark: SparkSession, indexDir: String) {

  private val embeddingSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Index everything currently staged, then return. */
  def ingestAvailable(stagingDir: String, checkpointDir: String): Unit = {
    val q = spark.readStream
      .schema(embeddingSchema)
      .parquet(stagingDir)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) => if (!batch.isEmpty) { ingestBatch(batch.toDF()); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def ingestBatch(batch: DataFrame): Unit = {
    // in-batch dedup first (a staged drop may repeat ids), then the
    // cross-batch gate against what the index already holds
    // localCheckpoint: build/append each run several passes (identity
    // agg, codebook, encode, assign) — materialize the micro-batch
    // once instead of re-reading the source files per pass
    val fresh = batch.dropDuplicates("vec_id").localCheckpoint()
    val metaPath = new org.apache.hadoop.fs.Path(s"$indexDir/meta")
    val fs = metaPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath)) {
      AnnIndex.build(fresh, indexDir)
    } else {
      val indexed = spark.read.parquet(s"$indexDir/postings")
        .select(col("nid").as("vec_id"))
      val newOnly = fresh.join(indexed, Seq("vec_id"), "left_anti")
      if (!newOnly.isEmpty)
        AnnIndex.append(newOnly, indexDir, checkIds = false)
    }
  }
}
