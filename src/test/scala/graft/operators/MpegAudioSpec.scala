package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MPEG audio (ISO 11172-3) verification: all-layer frame-header walk
  * against the closed synthesis form, ID3v2 skipping, VBR detection,
  * and the MPEG-1 Layer I subband requantization roundtrip. */
class MpegAudioSpec extends AnyFunSuite {

  private val kbpsL3 =
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val srV1 = Array(44100, 48000, 32000)

  test("mp3Meta walks synthesized Layer III frames: count, bitrate, " +
       "rate, duration match the closed form") {
    for (n <- Seq(1, 3, 5); brIdx <- Seq(1, 7, 14); srIdx <- 0 to 2) {
      val p = MpegAudio.mp3SynthFrames(n, brIdx, srIdx)
      val m = MpegAudio.mp3Meta(7L, p)
      val kbps = kbpsL3(brIdx - 1); val sr = srV1(srIdx)
      assert(m.valid && !m.vbr)
      assert(m.version == 1 && m.layer == 3 && m.channels == 1)
      assert(m.bitrate_kbps == kbps, s"br $brIdx")
      assert(m.sample_rate == sr)
      assert(m.n_frames == n)
      assert(m.n_bytes == n.toLong * (144 * kbps * 1000 / sr))
      assert(m.duration_ms == n.toLong * 1152 * 1000 / sr)
    }
  }

  test("mp3Meta skips an ID3v2 tag and flags mixed-bitrate streams VBR") {
    val f1 = MpegAudio.mp3SynthFrames(1, 5, 0)
    val f2 = MpegAudio.mp3SynthFrames(1, 9, 0)
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 1, 3) ++
      new Array[Byte](131) // syncsafe size 0x83 = 131 payload bytes
    val m = MpegAudio.mp3Meta(1L, id3 ++ f1 ++ f2)
    assert(m.valid && m.vbr && m.n_frames == 2)
    assert(m.bitrate_kbps == kbpsL3(4)) // FIRST frame's bitrate
    // a truncated final frame does not count
    val cut = MpegAudio.mp3Meta(1L, f1 ++ f2.dropRight(1))
    assert(cut.n_frames == 1 && !cut.vbr)
  }

  test("parseFrameHeader rejects bad sync, reserved fields, free format") {
    def hdr(b1: Int, b2: Int, b3: Int, b4: Int) =
      MpegAudio.parseFrameHeader(Array(b1.toByte, b2.toByte, b3.toByte,
        b4.toByte), 0)
    assert(hdr(0xfe, 0xfb, 0x92, 0xc0).isEmpty) // broken sync
    assert(hdr(0xff, 0xeb, 0x92, 0xc0).isEmpty) // reserved version (01)
    assert(hdr(0xff, 0xf9, 0x92, 0xc0).isEmpty) // reserved layer (00)
    assert(hdr(0xff, 0xfb, 0x02, 0xc0).isEmpty) // free-format bitrate
    assert(hdr(0xff, 0xfb, 0xf2, 0xc0).isEmpty) // forbidden bitrate 15
    assert(hdr(0xff, 0xfb, 0x9e, 0xc0).isEmpty) // reserved samplerate
    assert(hdr(0xff, 0xfb, 0x92, 0xc0).nonEmpty) // valid V1 L3
    assert(MpegAudio.mp3Meta(1L, Array.fill[Byte](64)(0x20)).valid == false)
  }

  test("Layer I roundtrip: synthesized codes requantize to the closed " +
       "form; silent subbands stay zero") {
    for (id <- Seq(0L, 1L, 17L, 255L, 9999L)) {
      val sb = (id % 32).toInt
      val a = (id % 14 + 1).toInt; val nb = a + 1
      val sfi = (3 * (id % 21)).toInt
      def code(s: Int): Int = ((id * 7 + s * 13) % (1L << nb)).toInt
      val frame = MpegAudio.mp1Synth(sb, a, sfi, code)
      val dec = MpegAudio.decodeLayer1(frame)
      assert(dec.channels == 1 && dec.sampleRate == 32000)
      for (s <- 0 until 12)
        assert(dec.sub(0)(sb * 12 + s) ==
          MpegAudio.dequantLayer1(code(s), nb, sfi), s"id=$id s=$s")
      for (other <- 0 until 32 if other != sb; s <- 0 until 12)
        assert(dec.sub(0)(other * 12 + s) == 0.0)
    }
  }

  test("dequantLayer1 matches hand-computed spec values and brackets " +
       "the quantizer grid symmetrically") {
    // nb=2, sf index 3 (sf = 1.0): s''' in {-1, -1/2, 0, +1/2}
    // s'' = (4/3) * (s''' + 1/2)
    assert(MpegAudio.dequantLayer1(0, 2, 3) == (4.0 / 3.0) * -0.5)
    assert(MpegAudio.dequantLayer1(1, 2, 3) == 0.0)
    assert(MpegAudio.dequantLayer1(2, 2, 3) == (4.0 / 3.0) * 0.5)
    // scalefactor index 0 doubles everything (table head = 2.0)
    assert(MpegAudio.dequantLayer1(2, 2, 0) ==
      MpegAudio.dequantLayer1(2, 2, 3) * 2.0)
    // grid symmetry: code c and its mirror sum to twice the midpoint
    for (nb <- 2 to 15; c <- Seq(0, 1, (1 << nb) - 2)) {
      val mid = MpegAudio.dequantLayer1(1 << (nb - 1), nb, 3)
      val lo = MpegAudio.dequantLayer1(c, nb, 3)
      val hi = MpegAudio.dequantLayer1((1 << nb) - c, nb, 3)
      assert(math.abs(lo + hi - 2 * mid) < 1e-12, s"nb=$nb c=$c")
    }
  }

  test("decodeLayer1 rejects joint stereo, wrong layers, truncation") {
    // V1 Layer I joint-stereo header (mode bits 01)
    val joint = Array(0xff, 0xff, 0x42, 0x40).map(_.toByte) ++
      new Array[Byte](256)
    intercept[IllegalArgumentException](MpegAudio.decodeLayer1(joint))
    // Layer III stream is walkable but not Layer-I-decodable
    val l3 = MpegAudio.mp3SynthFrames(1, 5, 0)
    intercept[IllegalArgumentException](MpegAudio.decodeLayer1(l3))
    // truncated Layer I frame
    val ok = MpegAudio.mp1Synth(3, 4, 6, _ => 5)
    intercept[IllegalArgumentException](
      MpegAudio.decodeLayer1(ok.dropRight(ok.length / 2)))
    assert(MpegAudio.decodeLayer1(ok).sub(0)(3 * 12) ==
      MpegAudio.dequantLayer1(5, 5, 6))
  }

  test("Layer II roundtrip: ungrouped codes requantize to the closed " +
       "form under every scfsi sharing mode; silent subbands stay zero") {
    for (id <- Seq(0L, 1L, 17L, 255L, 9999L); scfsi <- 0 to 3) {
      val sb = (id % 3).toInt // class-0 subband: 2^nb - 1 levels
      val allocIdx = (id % 15 + 1).toInt
      val levels = (1 << (allocIdx + 1)) - 1
      val sfi = Array((3 * (id % 21)).toInt, (3 * ((id + 5) % 21)).toInt,
        (3 * ((id + 11) % 21)).toInt)
      def code(s: Int): Int = ((id * 7 + s * 13) % levels).toInt
      val frame = MpegAudio.mp2Synth(sb, allocIdx, scfsi, sfi, code)
      val dec = MpegAudio.decodeLayer2(frame)
      assert(dec.channels == 1 && dec.sampleRate == 32000)
      // effective per-part scalefactor under the scfsi contract
      def part(s: Int): Int = s / 12
      def eff(pt: Int): Int = scfsi match {
        case 0 => sfi(pt)
        case 1 => if (pt < 2) sfi(0) else sfi(1)
        case 2 => sfi(0)
        case _ => if (pt == 0) sfi(0) else sfi(1)
      }
      for (s <- 0 until 36)
        assert(dec.sub(0)(sb * 36 + s) ==
          MpegAudio.dequantLayer2(code(s), levels, eff(part(s))),
          s"id=$id scfsi=$scfsi s=$s")
      for (other <- 0 until MpegAudio.L2SbLimit if other != sb;
           s <- 0 until 36)
        assert(dec.sub(0)(other * 36 + s) == 0.0)
    }
  }

  test("Layer II grouped 3/5/9-level triplets unpack in sample order " +
       "and requantize symmetrically") {
    // subband 11 (class 2): allocIdx 1/2/4 -> 3/5/9 levels (grouped)
    for ((allocIdx, levels) <- Seq((1, 3), (2, 5), (4, 9))) {
      def code(s: Int): Int = (s * 5 + 1) % levels
      val frame = MpegAudio.mp2Synth(11, allocIdx, 2, Array(3), code)
      val dec = MpegAudio.decodeLayer2(frame)
      for (s <- 0 until 36)
        assert(dec.sub(0)(11 * 36 + s) ==
          MpegAudio.dequantLayer2(code(s), levels, 3),
          s"levels=$levels s=$s")
    }
    // hand-checked spec values at sf index 3 (sf = 1.0):
    // 3 levels: C=4/3, D=1/2, requantized endpoints -2/3 and +2/3
    assert(MpegAudio.dequantLayer2(0, 3, 3) == (4.0 / 3.0) * -0.5)
    assert(MpegAudio.dequantLayer2(1, 3, 3) == 0.0)
    assert(MpegAudio.dequantLayer2(2, 3, 3) == (4.0 / 3.0) * 0.5)
    // 5 levels: C=8/5, D=1/2 -> end points -4/5 and +4/5
    assert(MpegAudio.dequantLayer2(0, 5, 3) == 1.6 * -0.5)
    assert(MpegAudio.dequantLayer2(4, 5, 3) == 1.6 * 0.5)
    // 9 levels: C=16/9, D=1/2 -> end points -8/9 and +8/9
    assert(MpegAudio.dequantLayer2(0, 9, 3) == (16.0 / 9.0) * -0.5)
    assert(MpegAudio.dequantLayer2(8, 9, 3) == (16.0 / 9.0) * 0.5)
    // the quantizer grid is symmetric for every B.2a level count
    for (levels <- Seq(3, 5, 7, 9, 15, 31, 63, 65535)) {
      val lo = MpegAudio.dequantLayer2(0, levels, 3)
      val hi = MpegAudio.dequantLayer2(levels - 1, levels, 3)
      assert(math.abs(lo + hi) < 1e-12, s"levels=$levels")
    }
  }

  test("decodeLayer2 rejects Layer I/III input and truncation") {
    val l1 = MpegAudio.mp1Synth(3, 4, 6, _ => 5)
    intercept[IllegalArgumentException](MpegAudio.decodeLayer2(l1))
    val ok = MpegAudio.mp2Synth(0, 3, 2, Array(6), _ => 1)
    intercept[IllegalArgumentException](
      MpegAudio.decodeLayer2(ok.dropRight(ok.length / 2)))
    assert(MpegAudio.decodeLayer2(ok).sub(0)(0) ==
      MpegAudio.dequantLayer2(1, 15, 6))
  }

  test("Layer III side-info grid: every field of both granule branches " +
    "roundtrips bit-exactly through synth -> decode") {
    // grid over the field extremes plus a pseudo-random sweep: the
    // long branch (3 table selects + region counts) and the switched
    // branch (2 table selects + 3 subblock gains) interleave in one
    // frame, so a single misplaced bit shifts every later field and
    // the equality fails loudly
    def long(bv: Int, gg: Int, sfc: Int, ts: (Int, Int, Int), r0: Int,
             r1: Int, pf: Int, ss: Int, c1: Int) =
      MpegAudio.Mp3Granule(0, bv, gg, sfc, windowSwitching = false, 0,
        mixedBlock = false, Array(ts._1, ts._2, ts._3), Array.empty,
        r0, r1, pf, ss, c1)
    def short(bv: Int, gg: Int, sfc: Int, bt: Int, mx: Boolean,
              ts: (Int, Int), sbg: (Int, Int, Int), pf: Int, ss: Int,
              c1: Int) =
      MpegAudio.Mp3Granule(0, bv, gg, sfc, windowSwitching = true, bt,
        mx, Array(ts._1, ts._2), Array(sbg._1, sbg._2, sbg._3), -1, -1,
        pf, ss, c1)
    // switched block_type spans 1..3 only: 0 with the window-switching
    // flag set is spec-invalid and the synth rejects it (guard below)
    val cases = Seq(
      (0, 0, Array(long(0, 0, 0, (0, 0, 0), 0, 0, 0, 0, 0),
        short(0, 0, 0, 1, false, (0, 0), (0, 0, 0), 0, 0, 0))),
      (511, 15, Array(long(288, 255, 15, (31, 31, 31), 15, 7, 1, 1, 1),
        short(288, 255, 15, 3, true, (31, 31), (7, 7, 7), 1, 1, 1)))) ++
      (1 to 24).map { k =>
        (k * 19 % 512, k * 7 % 16, Array(
          long(k * 13 % 289, k * 29 % 256, k % 16,
            (k % 32, k * 3 % 32, k * 7 % 32), k % 16, k % 8,
            k % 2, k / 2 % 2, k / 4 % 2),
          short(k * 11 % 289, k * 31 % 256, k * 5 % 16, 1 + k % 3,
            k / 8 % 2 == 1, (k * 5 % 32, k * 11 % 32),
            (k % 8, k * 3 % 8, k * 5 % 8), k / 16 % 2, k / 2 % 2,
            k % 2)))
      }
    for ((mdb, scfsi, grs) <- cases) {
      val si = MpegAudio.decodeLayer3Side(
        MpegAudio.mp3SynthSide(mdb, scfsi, grs))
      assert(si.channels == 1 && si.mainDataBegin == mdb &&
        si.scfsi(0) == scfsi, s"mdb=$mdb scfsi=$scfsi")
      for (gi <- 0 to 1) {
        val (g, e) = (si.granules(gi)(0), grs(gi))
        assert(g.bigValues == e.bigValues && g.globalGain == e.globalGain
          && g.scalefacCompress == e.scalefacCompress
          && g.windowSwitching == e.windowSwitching
          && g.blockType == e.blockType && g.mixedBlock == e.mixedBlock
          && g.tableSelect.toSeq == e.tableSelect.toSeq
          && g.subblockGain.toSeq == e.subblockGain.toSeq
          && g.region0Count == e.region0Count
          && g.region1Count == e.region1Count && g.preflag == e.preflag
          && g.scalefacScale == e.scalefacScale
          && g.count1Table == e.count1Table,
          s"mdb=$mdb gr=$gi: $g vs $e")
      }
    }
  }

  test("decodeLayer3Side rejects Layer I/II input and an ID3v2 tag is " +
    "skipped before the side-info parse") {
    intercept[IllegalArgumentException](
      MpegAudio.decodeLayer3Side(MpegAudio.mp1Synth(3, 4, 6, _ => 5)))
    intercept[IllegalArgumentException](
      MpegAudio.decodeLayer3Side(MpegAudio.mp2Synth(0, 3, 2, Array(6),
        _ => 1)))
    val g = MpegAudio.Mp3Granule(0, 7, 9, 3, windowSwitching = false, 0,
      mixedBlock = false, Array(1, 2, 3), Array.empty, 4, 5, 1, 0, 1)
    // BitWriter keeps only the low n bits, so every out-of-range field
    // must fail the synth loudly instead of roundtripping to different
    // values: 5-bit table_select, 1-bit flags, 3-bit subblock_gain,
    // and the spec-invalid switched block_type 0
    intercept[IllegalArgumentException](MpegAudio.mp3SynthSide(42, 6,
      Array(g.copy(tableSelect = Array(32, 2, 3)), g)))
    intercept[IllegalArgumentException](MpegAudio.mp3SynthSide(42, 6,
      Array(g.copy(preflag = 2), g)))
    intercept[IllegalArgumentException](MpegAudio.mp3SynthSide(42, 6,
      Array(g.copy(count1Table = -1), g)))
    val sw = MpegAudio.Mp3Granule(0, 7, 9, 3, windowSwitching = true, 2,
      mixedBlock = false, Array(1, 2), Array(1, 2, 3), -1, -1, 0, 0, 0)
    intercept[IllegalArgumentException](MpegAudio.mp3SynthSide(42, 6,
      Array(sw.copy(blockType = 0), sw)))
    intercept[IllegalArgumentException](MpegAudio.mp3SynthSide(42, 6,
      Array(sw.copy(subblockGain = Array(8, 0, 0)), sw)))
    val frame = MpegAudio.mp3SynthSide(42, 6, Array(g, g))
    val tagged = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++
      new Array[Byte](10) ++ frame
    val si = MpegAudio.decodeLayer3Side(tagged)
    assert(si.mainDataBegin == 42 && si.granules(1)(0).bigValues == 7)
  }
}
