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

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("video sample table resolves every frame's byte range and pts") {
    val frames = Seq(Array.fill(40)(1.toByte), Array.fill(25)(2.toByte),
      Array.fill(33)(3.toByte))
    val p = Mp4.mp4SynthVideo(frames, timescale = 1000, frameDur = 40,
      w = 8, h = 6)
    val Some((ts, refs)) = Mp4.videoFrames(p)
    assert(ts == 1000)
    assert(refs.map(_.size) == Seq(40, 25, 33))
    assert(refs.map(_.pts) == Seq(0L, 40L, 80L))
    // offsets are consecutive inside the single mdat chunk, and slicing
    // them recovers the exact frame bytes
    assert(refs(1).offset == refs(0).offset + 40)
    assert(refs(2).offset == refs(1).offset + 25)
    refs.zip(frames).foreach { case (r, f) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(p, r.offset, r.offset + r.size), f))
    }
    // the file still walks as plain metadata too
    assert(Mp4.mp4Meta(1L, p).valid)
  }

  test("multi-chunk stsc runs lay samples head-to-tail per chunk") {
    // hand-built: mdat "ABCDEFGHI" = samples ABCD, EF (chunk 1) and GHI
    // (chunk 2); stsc runs (1,2),(2,1)
    val mdat = Mp4.box("mdat", "ABCDEFGHI".getBytes("US-ASCII"))
    val mdhd = Mp4.box("mdhd", be32(0), be32(0), be32(0), be32(600),
      be32(120), be32(0))
    val hdlr = Mp4.box("hdlr", be32(0), be32(0),
      "vide".getBytes("US-ASCII"), new Array[Byte](13))
    val stsd = Mp4.box("stsd", be32(0), be32(1),
      Mp4.box("mjpa", new Array[Byte](8)))
    val stbl = Mp4.box("stbl", stsd, Mp4.stts(3, 40),
      Mp4.stsc(Seq((1, 2), (2, 1))), Mp4.stsz(Seq(4, 2, 3)),
      Mp4.stco(Seq(8L, 14L)))
    val moov = Mp4.box("moov", Mp4.box("trak", Mp4.box("mdia",
      mdhd, hdlr, Mp4.box("minf", stbl))))
    val Some((ts, refs)) = Mp4.videoFrames(mdat ++ moov)
    assert(ts == 600)
    assert(refs.map(r => (r.idx, r.offset, r.size, r.pts)) ==
      Seq((0, 8, 4, 0L), (1, 12, 2, 40L), (2, 14, 3, 80L)))
  }

  test("u32 table values >= 2^31 refuse instead of wrapping negative") {
    // a sample size or samples_per_chunk of 2^31 would wrap negative
    // under .toInt, shrink the off+size bound, and emit a bogus
    // negative-size FrameRef — the walk must return None instead
    val mdat = Mp4.box("mdat", "ABCD".getBytes("US-ASCII"))
    val mdhd = Mp4.box("mdhd", be32(0), be32(0), be32(0), be32(600),
      be32(120), be32(0))
    val hdlr = Mp4.box("hdlr", be32(0), be32(0),
      "vide".getBytes("US-ASCII"), new Array[Byte](13))
    val stsd = Mp4.box("stsd", be32(0), be32(1),
      Mp4.box("mjpa", new Array[Byte](8)))
    def file(stsz: Array[Byte], stsc: Array[Byte]) = {
      val stbl = Mp4.box("stbl", stsd, Mp4.stts(1, 40), stsc, stsz,
        Mp4.stco(Seq(8L)))
      mdat ++ Mp4.box("moov", Mp4.box("trak", Mp4.box("mdia",
        mdhd, hdlr, Mp4.box("minf", stbl))))
    }
    val big = 0x80000000L // 2^31: positive as u32, negative as Int
    val okStsc = Mp4.stsc(Seq((1, 1)))
    // constant sample_size = 2^31
    assert(Mp4.videoFrames(file(
      Mp4.box("stsz", be32(0), be32(big), be32(1)), okStsc)).isEmpty)
    // per-sample size = 2^31
    assert(Mp4.videoFrames(file(
      Mp4.box("stsz", be32(0), be32(0), be32(1), be32(big)), okStsc)).isEmpty)
    // samples_per_chunk = 2^31
    assert(Mp4.videoFrames(file(Mp4.stsz(Seq(4)),
      Mp4.box("stsc", be32(0), be32(1), be32(1), be32(big), be32(1))))
      .isEmpty)
    // huge u32 COUNT fields (stco/stsc/stts entry_count = 2^29) must
    // refuse too: 4*n / 12*n Int bound math would overflow negative and
    // let the loop allocate gigabytes or index out of bounds
    val hugeCount = 0x20000000L
    def fileStco(stco: Array[Byte]) = {
      val stbl = Mp4.box("stbl", stsd, Mp4.stts(1, 40), okStsc,
        Mp4.stsz(Seq(4)), stco)
      mdat ++ Mp4.box("moov", Mp4.box("trak", Mp4.box("mdia",
        mdhd, hdlr, Mp4.box("minf", stbl))))
    }
    assert(Mp4.videoFrames(fileStco(
      Mp4.box("stco", be32(0), be32(hugeCount), be32(8)))).isEmpty)
    assert(Mp4.videoFrames(file(Mp4.stsz(Seq(4)),
      Mp4.box("stsc", be32(0), be32(hugeCount), be32(1), be32(1), be32(1))))
      .isEmpty)
    // the same fixture with sane tables resolves (the refusals above are
    // the overflow guards, not an unrelated structural defect)
    assert(Mp4.videoFrames(file(Mp4.stsz(Seq(4)), okStsc)).nonEmpty)
  }

  test("sample-table walk refuses inconsistent or out-of-range tables") {
    val frames = Seq(Array.fill(10)(1.toByte))
    val p = Mp4.mp4SynthVideo(frames, 1000, 40, 4, 4)
    // truncation clips the trailing moov -> structural refusal
    assert(Mp4.videoFrames(p.dropRight(1)).isEmpty)
    assert(Mp4.videoFrames(java.util.Arrays.copyOf(p, 20)).isEmpty)
    // an audio-only file has no video track to resolve
    val audioOnly = Mp4.mp4Synth("isom", 1000, 100, "avc1", 0, 0,
      withAudio = true, mdatBytes = 4)
    // mp4Synth's video trak has no sample table at all -> None
    assert(Mp4.videoFrames(audioOnly).isEmpty)
  }
}
