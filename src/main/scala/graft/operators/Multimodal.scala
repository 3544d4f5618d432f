package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * Two decode tiers:
  *  - REAL decoders for uncompressed container formats whose parsing is
  *    pure byte arithmetic and needs no codec library: BMP headers
  *    ([[bmpMeta]]) and RIFF/WAVE PCM headers + sample access
  *    ([[wavMeta]], [[wavFrames]]);
  *  - a clearly-marked STUB ([[decodeStub]]) standing in for compressed
  *    formats (JPEG/MP3/H.264) whose codecs this environment doesn't ship.
  *
  * Everything around the decoders — the schema, the per-partition batch
  * iteration, the metadata contract, the partitioned layout — is the part
  * that matters at 100 TB: binary columns stream through Tungsten off-heap
  * rows, and `mapPartitions` gives a codec one initialization per
  * partition instead of one per row.
  */
object Multimodal {

  // ------------------------------------------------ real header decoders

  case class BmpMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                     bits_per_pixel: Int, valid: Boolean)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** REAL BMP decode (BITMAPINFOHEADER): magic, width/height (signed;
    * negative height = top-down rows), bpp — plain little-endian byte math. */
  def bmpMeta(docId: Long, payload: Array[Byte]): BmpMeta = {
    if (payload == null || payload.length < 30 ||
        payload(0) != 'B'.toByte || payload(1) != 'M'.toByte)
      return BmpMeta(docId, if (payload == null) 0L else payload.length.toLong,
        0, 0, 0, valid = false)
    BmpMeta(docId, payload.length.toLong,
      le32(payload, 18), math.abs(le32(payload, 22)), le16(payload, 28),
      valid = true)
  }

  case class WavMeta(doc_id: Long, n_bytes: Long, channels: Int,
                     sample_rate: Int, bits_per_sample: Int, n_samples: Long,
                     duration_ms: Long, valid: Boolean)

  /** REAL RIFF/WAVE PCM decode: walks the chunk list to `fmt ` and `data`,
    * derives sample count and duration. */
  def wavMeta(docId: Long, payload: Array[Byte]): WavMeta = {
    def invalid = WavMeta(docId,
      if (payload == null) 0L else payload.length.toLong, 0, 0, 0, 0L, 0L,
      valid = false)
    if (payload == null || payload.length < 44 ||
        !(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
          payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
          payload(10) == 'V' && payload(11) == 'E')) return invalid
    var off = 12
    var channels = 0; var rate = 0; var bits = 0; var dataLen = -1
    var malformed = false
    while (!malformed && off + 8 <= payload.length) {
      val id = new String(payload, off, 4, "US-ASCII")
      val size = le32(payload, off + 4)
      if (size < 0) malformed = true // corrupt length would loop/walk back
      else {
        if (id == "fmt " && off + 24 <= payload.length) {
          channels = le16(payload, off + 10)
          rate = le32(payload, off + 12)
          bits = le16(payload, off + 22)
        } else if (id == "data") {
          dataLen = math.min(size, payload.length - off - 8)
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    if (malformed) return invalid
    if (channels <= 0 || rate <= 0 || bits <= 0 || dataLen < 0) return invalid
    val bytesPerFrame = channels * (bits / 8)
    val nSamples = if (bytesPerFrame == 0) 0L else dataLen.toLong / bytesPerFrame
    WavMeta(docId, payload.length.toLong, channels, rate, bits, nSamples,
      nSamples * 1000L / rate, valid = true)
  }

  /** REAL PCM frame sampling: every k-th frame's first-channel amplitude
    * (16-bit signed) from a RIFF/WAVE payload — the audio analogue of video
    * frame extraction, 1 row -> N rows. */
  def wavFrames(docId: Long, payload: Array[Byte],
                everyK: Int): Seq[(Long, Long, Int)] = {
    val meta = wavMeta(docId, payload)
    if (!meta.valid || meta.bits_per_sample != 16) return Seq.empty
    // find the data chunk again (cheap: headers are tiny); meta.valid has
    // already rejected negative chunk sizes, but guard the walk anyway
    var off = 12
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= payload.length && dataOff < 0) {
      val id = new String(payload, off, 4, "US-ASCII")
      val size = le32(payload, off + 4)
      if (size < 0) return Seq.empty
      if (id == "data") { dataOff = off + 8; dataLen = math.min(size, payload.length - dataOff) }
      off += 8 + size + (size & 1)
    }
    if (dataOff < 0) return Seq.empty
    val frameBytes = meta.channels * 2
    val n = dataLen / frameBytes
    (0 until n by everyK).map { i =>
      val o = dataOff + i * frameBytes
      (docId, i.toLong, le16(payload, o).toShort.toInt)
    }
  }

  /** Canonical 44-byte-header PCM WAV encoder — the synthesis side of the
    * decode roundtrip (specs and the oracle query build payloads with it). */
  def wavSynth(channels: Int, rate: Int, samples: Seq[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort)
    bb.putInt(rate); bb.putInt(rate * channels * 2)
    bb.putShort((channels * 2).toShort); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Per-partition batched WAV decode over (doc_id, payload) rows. */
  def extractWavMeta(docs: DataFrame, idCol: String, binCol: String)
      : Dataset[WavMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => wavMeta(id, p) })
  }

  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                       format: String)

  /** STUB decode: a real implementation would hand `payload` to an image
    * library; this derives deterministic metadata from the bytes so the
    * plumbing is testable. Marked clearly as a fake. */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val h = java.util.Arrays.hashCode(payload)
    MediaMeta(docId, payload.length.toLong,
      math.floorMod(h, 1920) + 1, math.floorMod(h >> 11, 1080) + 1,
      Seq("jpeg", "png", "webp")(math.floorMod(docId, 3).toInt))
  }

  /** Per-partition batched decode over (doc_id, payload) rows — the shape a
    * real decoder plugs into (one codec init per partition). */
  def extractMeta(docs: DataFrame, idCol: String, binCol: String)
      : Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // codec initialization would happen here, once per partition
        it.map { case (id, payload) => decodeStub(id, payload) }
      }
  }

  /** Frame-sampling shape for video-like payloads: split a payload into
    * fixed-size chunks and keep every k-th — demonstrates the 1-row->N-rows
    * explode pattern binary pipelines need. */
  def sampleChunks(docs: DataFrame, idCol: String, binCol: String,
                   chunkBytes: Int = 64, everyK: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        payload.grouped(chunkBytes).zipWithIndex
          .filter(_._2 % everyK == 0)
          .map { case (chunk, idx) => (id, idx, chunk.length) }
      }.toDF("doc_id", "chunk_idx", "chunk_bytes")
  }
}
