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

  /** Integer fit-to-box: scale (w, h) so the longer side equals
    * `maxSide` (no-op when already within the box), floor division,
    * never below 1 px. Pure integer arithmetic so an oracle replays it
    * exactly — the formula is the contract between [[resizeImages]]
    * and the m4 oracle SQL. */
  def fitDims(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    val mx = math.max(w, h)
    if (mx <= maxSide) (w, h)
    else (math.max(1, (w.toLong * maxSide / mx).toInt),
          math.max(1, (h.toLong * maxSide / mx).toInt))
  }

  /** The resize stage: image rows get their PNG container REWRITTEN
    * (signature + CRC'd IHDR carrying the fitted dimensions; data
    * section untouched — pixel resampling is the codec-library slot,
    * see [[MediaContainers]]), audio/video rows pass through. Same
    * `mapPartitions` codec boundary as [[decode]]: partition-parallel,
    * no shuffle, one codec init per partition. The rewrap is real —
    * decoding the output parses the new header, which is how the m4
    * query verifies this stage end-to-end. */
  def resizeImages(decoded: Dataset[MediaRecord], maxSide: Int)
      : Dataset[MediaRecord] = {
    implicit val enc = decoded.encoder
    decoded.mapPartitions { it =>
      it.map { r =>
        if (r.media_type != "image") r
        else {
          val (w, h) = fitDims(r.width, r.height, maxSide)
          val data = java.util.Arrays.copyOfRange(
            r.media, MediaContainers.PngHeaderLen, r.media.length)
          val payload = MediaContainers.wrapPng(w, h, data)
          r.copy(media = payload, byte_len = payload.length.toLong,
            width = w, height = h)
        }
      }
    }
  }

  /** Frame sampling: every strideth frame index of each video row —
    * a generator (posexplode) over the decoded frame count; downstream
    * feature extraction fans out per frame without reshuffling. */
  def sampleFrames(decoded: Dataset[MediaRecord], stride: Int): DataFrame =
    decoded.toDF()
      // n_frames == 0 (payload shorter than one sample frame) must
      // yield zero rows, not a sequence(0, -1) boundary error
      .filter(col("media_type") === "video" && col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))

  /** Feature extraction over the opaque data section: count / sum /
    * min / max / mean of the unsigned byte values — the brightness
    * (image) / loudness-proxy (PCM) features — via the fused
    * [[graft.functions.ByteStats]] expression: one codegen'd pass per
    * row, a pure projection (no shuffle, no mapPartitions), so it
    * pipelines into whatever scan or stage precedes it. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val offset = when(col("media_type") === "image",
      lit(MediaContainers.PngHeaderLen))
      .otherwise(lit(MediaContainers.WavHeaderLen))
    media.withColumn("__bs",
        graft.functions.GraftFunctions.byte_stats(col("media"), offset))
      .select(col("doc_id"), col("media_type"),
        col("__bs.n_bytes").cast("long").as("n_bytes"),
        graft.ops.Ops.roundDet(col("__bs.b_sum").cast("double") /
          greatest(col("__bs.n_bytes"), lit(1)).cast("double"), 4)
          .as("byte_mean"),
        col("__bs.b_min").cast("long").as("byte_min"),
        col("__bs.b_max").cast("long").as("byte_max"))
  }
}
