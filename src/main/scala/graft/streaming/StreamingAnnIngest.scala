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
  * wants overlap silently skipped instead).
  *
  * Crash INSIDE an append (postings written, meta not yet rewritten)
  * is the one case this path must NOT self-heal: unlike a batch
  * caller, the stream holds no full-corpus handle, so "rebuild from
  * the current micro-batch" would silently replace an index holding
  * every previously ingested vector with one holding ONLY the
  * replayed batch — meta-valid, serving wrong neighbors, no
  * detectable invariant violation. [[ingestBatch]] therefore
  * distinguishes 'never built' from 'invalidated': missing meta WITH
  * index assets on disk is corruption, and it fails loudly with the
  * operator remedy (AnnIndex.build from the durable corpus, or wipe
  * the index dir to accept a from-scratch stream rebuild). Only a
  * truly empty index dir builds from the first micro-batch.
  */
final class StreamingAnnIngest(spark: SparkSession, indexDir: String,
                               compactAfterFiles: Int = 64) {

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
      // no meta: EITHER a never-built dir (safe to build from this
      // first batch) OR a crash mid-append left assets without their
      // commit marker — building from the micro-batch would drop all
      // previously ingested vectors behind a meta-valid index, so
      // fail loudly and leave the decision to the operator
      val orphaned = Seq("postings", "centroids", "codebook").filter(a =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/$a")))
      if (orphaned.nonEmpty)
        throw new IllegalStateException(
          s"ANN index at $indexDir has assets (${orphaned.mkString(", ")}) " +
            "but no meta commit marker — a crash mid-append invalidated " +
            "it. Rebuild from the durable corpus (AnnIndex.build) or " +
            "delete the index dir to rebuild from the stream, then " +
            "restart the ingest.")
      AnnIndex.build(fresh, indexDir)
    } else {
      // bloom-gated already-indexed filter: rows the stored id bloom
      // rules out are DEFINITELY new and skip the postings anti-join
      // entirely (the common all-new batch never reads the postings);
      // might-contain rows (true repeats + bloom FPP) take the exact
      // anti-join. Pre-bloom indexes fall back to the full anti-join.
      val newOnly = graft.ext.StoredIndex.bloomGatedNewOnly(
        spark, indexDir, fresh, "vec_id",
        spark.read.parquet(s"$indexDir/postings")
          .select(col("nid").as("vec_id")))
      if (!newOnly.isEmpty) {
        AnnIndex.append(newOnly, indexDir, checkIds = false)
        // self-maintenance: bound the small-file accretion of a long
        // append chain. A crash mid-compaction invalidates the meta;
        // this ingest holds no corpus, so the next batch fails
        // loudly (above) and the operator rebuilds — the same
        // contract as a crashed append.
        AnnIndex.maybeCompact(spark, indexDir, compactAfterFiles)
      }
    }
  }
}
