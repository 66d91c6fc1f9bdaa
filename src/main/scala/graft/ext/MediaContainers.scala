package graft.ext

import java.util.zip.CRC32

/** Real (pure-JVM) media container handling for the multimodal
  * pipeline: a PNG writer/parser (signature + IHDR chunk, CRC-checked)
  * and a RIFF/WAVE PCM writer/parser (proper chunk walk, not a fixed
  * 44-byte assumption). This replaces the r1 `FakeCodec` hash-dims
  * stub: `decodeDims` now reads actual container headers, and the
  * fixture payloads are actual containers, so the decode operator is
  * real and its output is predictable by an oracle from the fields the
  * writer embedded.
  *
  * Deliberately header-only: pixel/PCM payload decoding needs codec
  * libraries the container does not ship; the byte stream after the
  * header is carried opaque (exactly what a training-data pipeline
  * does until the GPU-side decode).
  */
object MediaContainers {

  /** Bytes before the opaque data section of a [[wrapPng]] stream:
    * 8 signature + 25 IHDR chunk (len + type + 13 data + CRC). */
  val PngHeaderLen: Int = 33

  /** Bytes before the data section of a [[wrapWav]] stream: the
    * canonical 44-byte RIFF/fmt/data header. */
  val WavHeaderLen: Int = 44

  private val PngMagic: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def u32be(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def u32le(v: Long): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def u16le(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte)

  private def readU32be(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xFFL) << 24) | ((p(off + 1) & 0xFFL) << 16) |
      ((p(off + 2) & 0xFFL) << 8) | (p(off + 3) & 0xFFL)

  private def readU32le(p: Array[Byte], off: Int): Long =
    (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
      ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)

  private def readU16le(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)

  /** Minimal valid PNG stream: signature, IHDR (8-bit truecolor,
    * CRC32 over type+data as the spec requires), then the payload
    * bytes carried opaque where IDAT would go. */
  def wrapPng(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    val body = new Array[Byte](17) // "IHDR" + 13 data bytes
    System.arraycopy("IHDR".getBytes("US-ASCII"), 0, body, 0, 4)
    System.arraycopy(u32be(width.toLong), 0, body, 4, 4)
    System.arraycopy(u32be(height.toLong), 0, body, 8, 4)
    body(12) = 8 // bit depth
    body(13) = 2 // color type: truecolor
    // compression, filter, interlace = 0
    val crc = new CRC32
    crc.update(body)
    PngMagic ++ u32be(13) ++ body ++ u32be(crc.getValue) ++ data
  }

  /** Canonical RIFF/WAVE PCM stream: RIFF header, "fmt " chunk
    * (16-byte PCM), "data" chunk holding the payload bytes. */
  def wrapWav(sampleRate: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    val bitsPerSample = 16
    val blockAlign = channels * bitsPerSample / 8
    val byteRate = sampleRate * blockAlign
    "RIFF".getBytes("US-ASCII") ++ u32le(36L + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ u32le(16) ++
      u16le(1) ++ u16le(channels) ++ u32le(sampleRate.toLong) ++
      u32le(byteRate.toLong) ++ u16le(blockAlign) ++ u16le(bitsPerSample) ++
      "data".getBytes("US-ASCII") ++ u32le(data.length.toLong) ++
      data
  }

  private def hasPrefix(p: Array[Byte], prefix: Array[Byte]): Boolean =
    p.length >= prefix.length && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(p, 0, prefix.length), prefix)

  private def tag(p: Array[Byte], off: Int): String =
    new String(p, off, 4, "US-ASCII")

  /** Parse a media payload's container header into the typed
    * (width, height, n_frames) metadata record:
    *  - PNG: IHDR width/height (CRC-verified), 1 frame
    *  - WAVE: (sample rate, channels, sample-frame count) — the
    *    "frames" of an audio stream are its sample frames
    * Throws IllegalArgumentException on an unrecognized or corrupt
    * container — a decode stage must fail loudly, not guess. */
  def decodeDims(p: Array[Byte]): (Int, Int, Int) = {
    if (hasPrefix(p, PngMagic)) {
      require(p.length >= 33 && tag(p, 12) == "IHDR", "corrupt PNG: no IHDR")
      val len = readU32be(p, 8)
      require(len == 13, s"corrupt PNG: IHDR length $len")
      val crc = new CRC32
      crc.update(p, 12, 17)
      require(crc.getValue == readU32be(p, 29), "corrupt PNG: IHDR CRC mismatch")
      ((readU32be(p, 16)).toInt, (readU32be(p, 20)).toInt, 1)
    } else if (p.length >= 12 && tag(p, 0) == "RIFF" && tag(p, 8) == "WAVE") {
      // real chunk walk: fmt may not be the first chunk. Every length
      // field is validated against the remaining bytes BEFORE use —
      // a hostile/corrupt length must throw, not hang the walk (a
      // 0xFFFFFFF8 length truncates to a negative step and would loop
      // forever) or read out of bounds.
      var off = 12
      var sampleRate = -1; var channels = -1; var blockAlign = -1
      var dataLen = -1L
      while (off + 8 <= p.length && (sampleRate < 0 || dataLen < 0)) {
        val t = tag(p, off)
        val len = readU32le(p, off + 4)
        require(len <= p.length - off - 8,
          s"corrupt WAVE: chunk '$t' length $len exceeds payload")
        if (t == "fmt ") {
          require(len >= 16, "corrupt WAVE: short fmt chunk")
          channels = readU16le(p, off + 10)
          sampleRate = readU32le(p, off + 12).toInt
          blockAlign = readU16le(p, off + 20)
        } else if (t == "data") {
          dataLen = len
        }
        off += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
      }
      require(sampleRate > 0 && blockAlign > 0 && dataLen >= 0,
        "corrupt WAVE: missing fmt /data chunk")
      (sampleRate, channels, (dataLen / blockAlign).toInt)
    } else {
      throw new IllegalArgumentException("unrecognized media container")
    }
  }
}
