package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF box-walk contracts (pure JVM — no SparkSession). */
class Mp4Spec extends AnyFunSuite {

  private def synth(id: Long): Array[Byte] =
    Mp4.mp4Synth("isom", 1000, 5000, "avc1", 640, 360,
      withAudio = true, mdatBytes = 32)

  test("round-trip: every synthesized field is re-derived by the walk") {
    val m = Mp4.mp4Meta(7L, synth(7L))
    assert(m.valid)
    assert(m.major_brand == "isom")
    assert(m.timescale == 1000)
    assert(m.duration_ms == 5000L)
    assert(m.n_tracks == 2)
    assert(m.video_codec == "avc1" && m.audio_codec == "mp4a")
    assert(m.width == 640 && m.height == 360)
  }

  test("unknown boxes are skipped BY SIZE (forward compatibility)") {
    // prepend an unknown top-level box and inject junk between traks:
    // the walk must still find everything
    val weird = Mp4.box("wide", new Array[Byte](13))
    val base = synth(1L)
    val m = Mp4.mp4Meta(1L, weird ++ base)
    assert(m.valid && m.n_tracks == 2 && m.video_codec == "avc1")
  }

  test("64-bit largesize (size == 1) boxes parse") {
    val body = new Array[Byte](10)
    val ls = 16L + body.length
    val large = Array(0, 0, 0, 1).map(_.toByte) ++
      "skip".getBytes("US-ASCII") ++
      Array(((ls >>> 56) & 0xff).toByte, ((ls >>> 48) & 0xff).toByte,
        ((ls >>> 40) & 0xff).toByte, ((ls >>> 32) & 0xff).toByte,
        ((ls >>> 24) & 0xff).toByte, ((ls >>> 16) & 0xff).toByte,
        ((ls >>> 8) & 0xff).toByte, (ls & 0xff).toByte) ++ body
    val m = Mp4.mp4Meta(2L, large ++ synth(2L))
    assert(m.valid && m.n_tracks == 2)
  }

  test("corruption refuses instead of guessing: truncation, undersized " +
    "and oversized box lengths, missing moov") {
    val good = synth(3L)
    assert(!Mp4.mp4Meta(3L, good.take(good.length - 5)).valid) // truncated
    assert(!Mp4.mp4Meta(3L, null).valid)
    assert(!Mp4.mp4Meta(3L, Array[Byte](1, 2, 3)).valid)
    // size field smaller than a header
    val undersized = Mp4.box("ftyp", "isom".getBytes("US-ASCII"))
    undersized(3) = 4
    assert(!Mp4.mp4Meta(3L, undersized).valid)
    // size field pointing past the buffer
    val oversized = good.clone()
    oversized(3) = (oversized(3) + 64).toByte
    assert(!Mp4.mp4Meta(3L, oversized).valid)
    // ftyp alone (no moov)
    assert(!Mp4.mp4Meta(3L, Mp4.box("ftyp",
      "isom".getBytes("US-ASCII"), new Array[Byte](8))).valid)
  }

  test("mvhd version 1 (64-bit duration) parses to the same duration") {
    // hand-build a v1 mvhd: version byte 1, 64-bit creation/modification,
    // 32-bit timescale, 64-bit duration
    def be32(v: Long) = Array(((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val mvhd1 = Mp4.box("mvhd",
      Array(1.toByte, 0, 0, 0), be64(0), be64(0), be32(90000), be64(123456L),
      new Array[Byte](80))
    val file = Mp4.box("ftyp", "isom".getBytes("US-ASCII"),
        be32(0x200), "isomisom".getBytes("US-ASCII")) ++
      Mp4.box("moov", mvhd1)
    val m = Mp4.mp4Meta(9L, file)
    assert(m.valid && m.timescale == 90000)
    assert(m.duration_ms == 123456L * 1000 / 90000)
    assert(m.n_tracks == 0)
  }
}
