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
  * The Spark-side plumbing — schema, partition-parallel batch decode,
  * frame sampling, metadata extraction — is real and tested. The
  * codec itself is STUBBED ([[FakeCodec]]): the container has no
  * image/audio libraries, so "decode" derives deterministic fake
  * dimensions from a hash of the bytes. Swapping in a real codec
  * changes only the body of [[FakeCodec.decodeDims]]; every plan
  * shape stays identical.
  *
  * Scale notes: the decode stage is `mapPartitions` over a typed
  * Dataset — one codec init per partition (not per row), no shuffle;
  * metadata-only queries never touch the binary column because
  * parquet column pruning drops it at the scan.
  */
object Multimodal {

  /** Deterministic stand-in for an image/audio codec. */
  object FakeCodec {
    /** STUB — replace with a real decoder. Derives (width, height,
      * n_frames) deterministically from the payload bytes. */
    def decodeDims(payload: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1,
        math.abs(h % 240) + 1)
    }
  }

  /** Build a media table from the documents fixture: the text bytes
    * stand in for an encoded payload (UTF-8 — matching DuckDB's
    * `encode()`), media_type assigned round-robin. In production this
    * is `spark.read.format("binaryFile")` or parquet with a binary
    * column. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").cast("binary").as("media"))

  /** Metadata extraction that needs no codec: pure column expressions
    * (codegen'd, prunable). */
  def withByteLen(media: DataFrame): DataFrame =
    media.withColumn("byte_len", octet_length(col("media")).cast("long"))

  /** The batch decode stage: partition-parallel, one codec "init" per
    * partition, rows streamed through — the Spark-native equivalent of
    * a batched pandas-UDF decode. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "media")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, mt, payload) =>
          val (w, h, f) = FakeCodec.decodeDims(payload)
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
