package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded-media record: the typed row produced by the decode
  * stage. `media` stays an opaque byte payload end-to-end. */
final case class MediaRecord(doc_id: Long, media_type: String,
                             media: Array[Byte], byte_len: Long,
                             width: Int, height: Int, n_frames: Int)

/** Multimodal column handling for training-data pipelines (extension
  * beyond the reference — SURVEY §7.4): image/audio/video as opaque
  * `binary` columns with typed metadata.
  *
  * The whole path is real: fixture payloads are valid PNG / RIFF-WAVE
  * containers ([[MediaContainers]]), and the decode stage parses the
  * actual container headers (CRC-checked IHDR, WAVE chunk walk). Only
  * pixel/PCM payload decoding is out of scope (no codec libraries in
  * the container) — the post-header bytes ride along opaque, exactly
  * as a training pipeline carries them until GPU-side decode.
  *
  * Scale notes: the decode stage is `mapPartitions` over a typed
  * Dataset — one codec init per partition (not per row), no shuffle;
  * metadata-only queries never touch the binary column because
  * parquet column pruning drops it at the scan.
  */
object Multimodal {

  /** Build a media table from the documents fixture: each document's
    * UTF-8 text bytes wrapped in a real container — PNG for image
    * rows, RIFF/WAVE for audio/video rows — with header fields derived
    * from the doc id ([[graft.functions.MediaWrap]]). media_type is
    * assigned round-robin. In production this is
    * `spark.read.format("binaryFile")` or parquet with a binary
    * column. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val mediaType = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    docs.select(col("doc_id"), mediaType.as("media_type"),
      graft.functions.GraftFunctions.media_wrap(col("doc_id"), mediaType,
        encode(col("text"), "UTF-8").cast("binary")).as("media"))
  }

  /** Metadata extraction that needs no codec: pure column expressions
    * (codegen'd, prunable). */
  def withByteLen(media: DataFrame): DataFrame =
    media.withColumn("byte_len", octet_length(col("media")).cast("long"))

  /** The batch decode stage: partition-parallel, one codec "init" per
    * partition, rows streamed through — the Spark-native equivalent of
    * a batched pandas-UDF decode. Parses the real container headers
    * ([[MediaContainers.decodeDims]]): PNG rows yield (width, height,
    * 1), WAVE rows (sample rate, channels, sample-frame count). */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "media")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, mt, payload) =>
          val (w, h, f) = MediaContainers.decodeDims(payload)
          MediaRecord(id, mt, payload, payload.length.toLong, w, h, f)
        }
      }
  }

  /** Frame sampling: every strideth frame index of each video row —
    * a generator (posexplode) over the decoded frame count; downstream
    * feature extraction fans out per frame without reshuffling. */
  def sampleFrames(decoded: Dataset[MediaRecord], stride: Int): DataFrame =
    decoded.toDF()
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
}
