package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The actual media decode is STUBBED (this environment ships no image/audio
  * libraries — see `decodeStub`): it derives deterministic fake
  * width/height/duration from the payload bytes. Everything around the stub
  * — the schema, the per-partition batch iteration, the metadata contract,
  * the partitioned layout — is real Spark plumbing, which is the part that
  * matters at 100 TB: binary columns stream through Tungsten off-heap rows,
  * and `mapPartitions` gives the decoder library (when it exists) one
  * initialization per partition instead of one per row.
  */
object Multimodal {

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
