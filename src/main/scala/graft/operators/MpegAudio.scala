package graft.operators

/** REAL MPEG audio (ISO/IEC 11172-3) byte-level support, no codec libs:
  *
  *  - [[mp3Meta]]: frame-header walk for ALL layers (I/II/III) and
  *    versions (MPEG-1/2/2.5) — sync scan, bitrate/samplerate tables,
  *    per-layer frame-length arithmetic, ID3v2 skip, VBR detection.
  *    This is the metadata a training-data pipeline actually routes on
  *    (duration, bitrate, rate, channel mode) and it needs no entropy
  *    decode at any layer.
  *  - [[decodeLayer1]]: REAL MPEG-1 Layer I subband decode — bit
  *    allocation, scalefactors, and the spec's requantization formula
  *    s'' = (2^nb / (2^nb - 1)) * (s''' + 2^(1-nb)) with MSB-inverted
  *    two's-complement fractions (11172-3 §2.4.3.3) — emitting the
  *    32-subband x 12-sample plane per channel. The polyphase synthesis
  *    window (tabulated in the spec's annex B table B.3) is the one
  *    step deliberately left out: subband samples are the spectral
  *    features pipelines consume (energy, activity), mirroring
  *    [[Multimodal.extractWavSpectrum]]'s role for PCM.
  *  - [[decodeLayer2]]: REAL MPEG-1 Layer II decode — allocation
  *    table B.2a classes, scfsi scalefactor sharing, grouped
  *    3/5/9-level triplet codes, and the generalized B.4
  *    requantization (round 8).
  *  - [[mp1Synth]] / [[mp2Synth]] / [[mp3SynthFrames]]: the synthesis
  *    side of the roundtrips, used by the oracle queries and specs.
  *
  *  - [[decodeLayer3Side]] / [[mp3SynthSide]]: REAL MPEG-1 Layer III
  *    SIDE-INFORMATION decode (§2.4.1.7 field arithmetic, both the
  *    long and window-switched granule branches) — the routing
  *    metadata (block types, reservoir depth, table/region usage)
  *    that needs no entropy tables.
  *
  * Layer III ENTROPY decode (big-values/count1 Huffman + IMDCT),
  * joint stereo, and the B.2b/c/d allocation tables remain declared
  * out of scope: the Huffman code assignments are NORMATIVE DATA
  * (11172-3 Annex B.7) that cannot be derived from first principles
  * and are not available in this environment — a from-memory
  * transcription would be unverifiable, because the synth/decode
  * roundtrip shares the table and cannot catch transcription errors.
  * See SURVEY_COVERAGE.md's refusal row; [[Multimodal.decodeStub]] is
  * the marked extension point.
  *
  * Determinism contract: requantization is evaluated in the documented
  * operation order `((c/2^(nb-1) - 1 + 2/2^nb) * (2^nb/(2^nb-1))) * sf`
  * — every constant a dyadic double — so an independent engine
  * evaluating the same order reproduces values bit-for-bit; scalefactor
  * indices divisible by 3 give exact power-of-two scalefactors (the
  * oracle rows use only those).
  *
  * Reference behavior anchor: the reference pipeline treats audio as
  * opaque binaries with sniffed metadata (etl/sources, binary columns);
  * this module is the Spark-side extension grading that contract up to
  * real frame arithmetic.
  */
object MpegAudio {

  // ------------------------------------------------------------ tables

  /** kbps by (version, layer, index 1..14); index 0 = free-format. */
  private val kbpsV1 = Array(
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // L1
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),    // L2
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))     // L3
  private val kbpsV2 = Array(
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),    // L1
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),         // L2
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))         // L3

  private val srV1 = Array(44100, 48000, 32000)
  private val srV2 = Array(22050, 24000, 16000)
  private val srV25 = Array(11025, 12000, 8000)

  /** Scalefactors, 11172-3 table B.1: sf(i) = 2 * 2^(-i/3), i = 0..62.
    * Indices divisible by 3 are exact powers of two (computed exactly);
    * the rest go through StrictMath.pow for platform determinism. */
  val scalefactor: Array[Double] = Array.tabulate(63) { i =>
    if (i % 3 == 0) 2.0 / (1L << (i / 3)).toDouble
    else 2.0 * StrictMath.pow(2.0, -i / 3.0)
  }

  // ------------------------------------------------------- header walk

  /** One parsed frame header. version: 1, 2, or 25 (for 2.5). layer:
    * 1/2/3. frameBytes includes the 4 header bytes. */
  final case class FrameHeader(version: Int, layer: Int, bitrateKbps: Int,
                               sampleRate: Int, channels: Int, padding: Int,
                               crc: Boolean, mode: Int, frameBytes: Int,
                               samplesPerFrame: Int)

  /** Parse the 4-byte header at `off`; None when not a valid, walkable
    * frame header (bad sync, reserved fields, free-format bitrate). */
  def parseFrameHeader(p: Array[Byte], off: Int): Option[FrameHeader] = {
    if (p == null || off + 4 > p.length) return None
    val b1 = p(off) & 0xff; val b2 = p(off + 1) & 0xff
    val b3 = p(off + 2) & 0xff; val b4 = p(off + 3) & 0xff
    if (b1 != 0xff || (b2 & 0xe0) != 0xe0) return None
    val versionBits = (b2 >> 3) & 3
    val layerBits = (b2 >> 1) & 3
    if (versionBits == 1 || layerBits == 0) return None // reserved
    val version = versionBits match {
      case 3 => 1
      case 2 => 2
      case _ => 25
    }
    val layer = 4 - layerBits // 3->I, 2->II, 1->III
    val bitrateIdx = (b3 >> 4) & 0xf
    val srIdx = (b3 >> 2) & 3
    if (bitrateIdx == 0 || bitrateIdx == 15 || srIdx == 3) return None
    val kbps = (if (version == 1) kbpsV1 else kbpsV2)(layer - 1)(bitrateIdx)
    val sr = (version match {
      case 1 => srV1
      case 2 => srV2
      case _ => srV25
    })(srIdx)
    val padding = (b3 >> 1) & 1
    val mode = (b4 >> 6) & 3
    val channels = if (mode == 3) 1 else 2
    val bps = kbps * 1000
    val frameBytes = layer match {
      case 1 => (12 * bps / sr + padding) * 4
      case 2 => 144 * bps / sr + padding
      case _ => // Layer III: MPEG-2/2.5 halve the frame
        (if (version == 1) 144 else 72) * bps / sr + padding
    }
    val spf = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (version == 1) 1152 else 576
    }
    Some(FrameHeader(version, layer, kbps, sr, channels, padding,
      crc = (b2 & 1) == 0, mode, frameBytes, spf))
  }

  /** ID3v2 tag length at the stream head (0 when absent): "ID3" + 2
    * version bytes + flags + 4 syncsafe size bytes + payload. */
  def id3v2Length(p: Array[Byte]): Int = {
    if (p == null || p.length < 10) return 0
    if (p(0) != 'I' || p(1) != 'D' || p(2) != '3') return 0
    val size = ((p(6) & 0x7f) << 21) | ((p(7) & 0x7f) << 14) |
      ((p(8) & 0x7f) << 7) | (p(9) & 0x7f)
    10 + size
  }

  final case class Mp3Meta(doc_id: Long, n_bytes: Long, version: Int,
                           layer: Int, bitrate_kbps: Int, sample_rate: Int,
                           channels: Int, n_frames: Int, duration_ms: Long,
                           vbr: Boolean, valid: Boolean)

  /** Walk every frame from the first valid header after any ID3v2 tag.
    * Reported bitrate is the FIRST frame's; `vbr` flags any frame that
    * differs. Trailing bytes that do not parse as a header end the walk
    * (a truncated final frame does not count). */
  def mp3Meta(docId: Long, p: Array[Byte]): Mp3Meta = {
    val n = if (p == null) 0L else p.length.toLong
    def invalid = Mp3Meta(docId, n, 0, 0, 0, 0, 0, 0, 0L, vbr = false,
      valid = false)
    if (p == null) return invalid
    var off = id3v2Length(p)
    parseFrameHeader(p, off) match {
      case None => invalid
      case Some(first) =>
        var frames = 0
        var sampleSum = 0L
        var vbr = false
        var h: Option[FrameHeader] = Some(first)
        while (h.isDefined && off + h.get.frameBytes <= p.length) {
          val fh = h.get
          frames += 1
          sampleSum += fh.samplesPerFrame
          if (fh.bitrateKbps != first.bitrateKbps) vbr = true
          off += fh.frameBytes
          h = parseFrameHeader(p, off)
        }
        Mp3Meta(docId, n, first.version, first.layer, first.bitrateKbps,
          first.sampleRate, first.channels, frames,
          sampleSum * 1000L / first.sampleRate, vbr, valid = frames > 0)
    }
  }

  // ---------------------------------------------- Layer I subband decode

  private final class BitReader(p: Array[Byte], var bitPos: Long) {
    def read(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val byte = p((bitPos >> 3).toInt) & 0xff
        val bit = (byte >> (7 - (bitPos & 7)).toInt) & 1
        v = (v << 1) | bit
        bitPos += 1; i += 1
      }
      v
    }
  }

  /** The spec's Layer I requantization in the documented operation
    * order (see class scaladoc); every input is a dyadic double, so the
    * result is engine-reproducible. code in [0, 2^nb), nb in [2, 15]. */
  def dequantLayer1(code: Int, nb: Int, sfIdx: Int): Double = {
    val half = (1L << (nb - 1)).toDouble
    val full = (1L << nb).toDouble
    ((code.toDouble / half - 1.0 + 2.0 / full) * (full / (full - 1.0))) *
      scalefactor(sfIdx)
  }

  /** Decoded Layer I frame: `sub(ch)(sb * 12 + s)` = requantized
    * subband sample, 0.0 where the subband has no allocation. */
  final case class Mp1Frame(sampleRate: Int, bitrateKbps: Int,
                            channels: Int, alloc: Array[Array[Int]],
                            sfIdx: Array[Array[Int]],
                            sub: Array[Array[Double]])

  /** Decode the first MPEG-1 Layer I frame at the stream head (after
    * any ID3v2 tag). Mono, stereo, and dual-channel modes; joint
    * (intensity) stereo is out of decode scope and throws. */
  def decodeLayer1(p: Array[Byte]): Mp1Frame = {
    val off = id3v2Length(p)
    val fh = parseFrameHeader(p, off).getOrElse(
      throw new IllegalArgumentException("no valid frame header"))
    require(fh.layer == 1 && fh.version == 1,
      s"not an MPEG-1 Layer I frame (v${fh.version} L${fh.layer})")
    require(fh.mode != 1,
      "joint (intensity) stereo is out of decode scope")
    require(off + fh.frameBytes <= p.length, "truncated frame")
    val nch = fh.channels
    val br = new BitReader(p, (off + 4).toLong * 8)
    if (fh.crc) br.read(16)
    val alloc = Array.ofDim[Int](nch, 32)
    var sb = 0
    while (sb < 32) {
      var ch = 0
      while (ch < nch) {
        val a = br.read(4)
        require(a != 15, s"forbidden allocation 15 at subband $sb")
        alloc(ch)(sb) = a
        ch += 1
      }
      sb += 1
    }
    val sf = Array.ofDim[Int](nch, 32)
    sb = 0
    while (sb < 32) {
      var ch = 0
      while (ch < nch) {
        if (alloc(ch)(sb) != 0) {
          val idx = br.read(6)
          require(idx < 63, s"forbidden scalefactor 63 at subband $sb")
          sf(ch)(sb) = idx
        }
        ch += 1
      }
      sb += 1
    }
    val out = Array.fill(nch)(new Array[Double](32 * 12))
    var s = 0
    while (s < 12) {
      sb = 0
      while (sb < 32) {
        var ch = 0
        while (ch < nch) {
          val a = alloc(ch)(sb)
          if (a != 0) {
            val nb = a + 1
            out(ch)(sb * 12 + s) = dequantLayer1(br.read(nb), nb, sf(ch)(sb))
          }
          ch += 1
        }
        sb += 1
      }
      s += 1
    }
    Mp1Frame(fh.sampleRate, fh.bitrateKbps, nch, alloc, sf, out)
  }

  // --------------------------------------------- Layer II subband decode

  /** Table B.2a allocation classes (ISO 11172-3): per subband, the
    * number of allocation bits and the level count per allocation
    * index. sblimit = 27; class sets as published. Streams using the
    * other allocation tables (B.2b/c/d, selected by sample rate and
    * per-channel bitrate) are the declared extension point alongside
    * Layer III entropy decode. */
  private val l2LevelsClass: Array[Array[Int]] = Array(
    // class 0 (sb 0-2), nbal 4
    Array(3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
      16383, 32767, 65535),
    // class 1 (sb 3-10), nbal 4
    Array(3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
      8191, 65535),
    // class 2 (sb 11-22), nbal 3
    Array(3, 5, 7, 9, 15, 31, 65535),
    // class 3 (sb 23-26), nbal 2
    Array(3, 5, 65535))
  private def l2Class(sb: Int): Int =
    if (sb < 3) 0 else if (sb < 11) 1 else if (sb < 23) 2 else 3
  private def l2Nbal(sb: Int): Int = Array(4, 4, 3, 2)(l2Class(sb))
  final val L2SbLimit = 27

  /** (codeBits, grouped) per level count: 3/5/9-level subbands pack a
    * sample TRIPLET into one 5/7/10-bit group code; the rest send three
    * nb-bit codes with nb = log2(levels + 1). */
  def l2CodeBits(levels: Int): (Int, Boolean) = levels match {
    case 3 => (5, true)
    case 5 => (7, true)
    case 9 => (10, true)
    case _ =>
      val nb = 32 - Integer.numberOfLeadingZeros(levels)
      require((1 << nb) - 1 == levels, s"not a B.2a level count: $levels")
      (nb, false)
  }

  /** Layer II requantization, the Layer I formula generalized to the
    * B.4 quantization classes: s'' = C * (s''' + D) * sf with
    * s''' = c / 2^(nb-1) - 1 and nb the smallest width holding the
    * levels (2 / 3 / 4 for the grouped 3 / 5 / 9). C = 2^nb / levels
    * — 4/3, 8/5, 16/9 grouped; 2^nb/(2^nb - 1) otherwise, exactly the
    * Layer I constant — and D = 1/2 grouped (symmetric mid-tread),
    * 2^(1-nb) otherwise. Every operand is a dyadic double or a ratio
    * of dyadics evaluated in a fixed order — engine-reproducible. */
  def dequantLayer2(code: Int, levels: Int, sfIdx: Int): Double = {
    val (bitsPerCode, grouped) = l2CodeBits(levels)
    val nb = if (grouped) levels match {
      case 3 => 2
      case 5 => 3
      case _ => 4 // 9 levels
    } else bitsPerCode
    val half = (1L << (nb - 1)).toDouble
    val c = (1L << nb).toDouble / levels.toDouble
    val d = if (grouped) 0.5 else 2.0 / (1L << nb).toDouble
    (c * (code.toDouble / half - 1.0 + d)) * scalefactor(sfIdx)
  }

  /** Decoded Layer II frame: `sub(ch)(sb * 36 + s)` = requantized
    * subband sample (36 samples = 12 triplets per subband), 0.0 where
    * unallocated. `sfIdx(ch)(sb)` holds the PART-0 scalefactor index. */
  final case class Mp2Frame(sampleRate: Int, bitrateKbps: Int,
                            channels: Int, alloc: Array[Array[Int]],
                            sfIdx: Array[Array[Int]],
                            sub: Array[Array[Double]])

  /** Decode the first MPEG-1 Layer II frame at the stream head (after
    * any ID3v2 tag), allocation table B.2a. Handles scfsi scalefactor
    * sharing (0: three, 1: parts 01|2, 2: one, 3: 0|12) and grouped
    * 3/5/9-level triplet codes. Mono/stereo/dual; intensity stereo is
    * out of decode scope and throws. */
  def decodeLayer2(p: Array[Byte]): Mp2Frame = {
    val off = id3v2Length(p)
    val fh = parseFrameHeader(p, off).getOrElse(
      throw new IllegalArgumentException("no valid frame header"))
    require(fh.layer == 2 && fh.version == 1,
      s"not an MPEG-1 Layer II frame (v${fh.version} L${fh.layer})")
    require(fh.mode != 1, "joint (intensity) stereo is out of decode scope")
    require(off + fh.frameBytes <= p.length, "truncated frame")
    val nch = fh.channels
    val br = new BitReader(p, (off + 4).toLong * 8)
    if (fh.crc) br.read(16)
    val alloc = Array.ofDim[Int](nch, L2SbLimit)
    var sb = 0
    while (sb < L2SbLimit) {
      var ch = 0
      while (ch < nch) {
        alloc(ch)(sb) = br.read(l2Nbal(sb))
        ch += 1
      }
      sb += 1
    }
    val scfsi = Array.ofDim[Int](nch, L2SbLimit)
    sb = 0
    while (sb < L2SbLimit) {
      var ch = 0
      while (ch < nch) {
        if (alloc(ch)(sb) != 0) scfsi(ch)(sb) = br.read(2)
        ch += 1
      }
      sb += 1
    }
    // sf(ch)(sb)(part) for parts 0/1/2 (12 samples each)
    val sf = Array.ofDim[Int](nch, L2SbLimit, 3)
    sb = 0
    while (sb < L2SbLimit) {
      var ch = 0
      while (ch < nch) {
        if (alloc(ch)(sb) != 0) {
          def rd(): Int = {
            val i = br.read(6)
            require(i < 63, s"forbidden scalefactor 63 at subband $sb")
            i
          }
          scfsi(ch)(sb) match {
            case 0 =>
              sf(ch)(sb)(0) = rd(); sf(ch)(sb)(1) = rd(); sf(ch)(sb)(2) = rd()
            case 1 =>
              val a = rd(); val b = rd()
              sf(ch)(sb)(0) = a; sf(ch)(sb)(1) = a; sf(ch)(sb)(2) = b
            case 2 =>
              val a = rd()
              sf(ch)(sb)(0) = a; sf(ch)(sb)(1) = a; sf(ch)(sb)(2) = a
            case _ =>
              val a = rd(); val b = rd()
              sf(ch)(sb)(0) = a; sf(ch)(sb)(1) = b; sf(ch)(sb)(2) = b
          }
        }
        ch += 1
      }
      sb += 1
    }
    val out = Array.fill(nch)(new Array[Double](L2SbLimit * 36))
    var gr = 0
    while (gr < 12) { // 12 triplets of samples
      sb = 0
      while (sb < L2SbLimit) {
        var ch = 0
        while (ch < nch) {
          val a = alloc(ch)(sb)
          if (a != 0) {
            val levels = l2LevelsClass(l2Class(sb))(a - 1)
            val (bits, grouped) = l2CodeBits(levels)
            val part = gr / 4
            val sfi = sf(ch)(sb)(part)
            if (grouped) {
              val c = br.read(bits)
              require(c < levels * levels * levels,
                s"group code out of range at subband $sb")
              var k = 0
              var rest = c
              while (k < 3) {
                out(ch)(sb * 36 + gr * 3 + k) =
                  dequantLayer2(rest % levels, levels, sfi)
                rest /= levels
                k += 1
              }
            } else {
              var k = 0
              while (k < 3) {
                out(ch)(sb * 36 + gr * 3 + k) =
                  dequantLayer2(br.read(bits), levels, sfi)
                k += 1
              }
            }
          }
          ch += 1
        }
        sb += 1
      }
      gr += 1
    }
    Mp2Frame(fh.sampleRate, fh.bitrateKbps, nch, alloc, sf.map(_.map(_(0))),
      out)
  }

  // ------------------------------------- Layer III side information

  /** One granule's Layer III side information, as PARSED — fields that
    * are absent from the bitstream for the granule's branch are
    * reported as -1 (region counts under window switching) or 0/empty
    * (subblock gains for long blocks), never spec-implied defaults:
    * this is the bit-level truth a routing pipeline keys on
    * (block-type mix, table usage, reservoir depth), not a decoder's
    * internal convention. */
  final case class Mp3Granule(part23Length: Int, bigValues: Int,
                              globalGain: Int, scalefacCompress: Int,
                              windowSwitching: Boolean, blockType: Int,
                              mixedBlock: Boolean, tableSelect: Array[Int],
                              subblockGain: Array[Int], region0Count: Int,
                              region1Count: Int, preflag: Int,
                              scalefacScale: Int, count1Table: Int)

  /** Parsed MPEG-1 Layer III side information of the first frame:
    * main_data_begin (bit-reservoir backpointer), per-channel scfsi,
    * and 2 granules x nch of [[Mp3Granule]]. The layout is fully
    * normative field arithmetic (11172-3 §2.4.1.7: 136 bits mono /
    * 256 stereo — 9+5/3 private+4·nch scfsi, then per granule
    * 12+9+8+4+1 and either 2+1+2·5+3·3 switched or 3·5+4+3 long,
    * then 1+1+1), so it decodes bit-exactly with no entropy tables.
    * The ENTROPY decode behind it (big-values/count1 Huffman) needs
    * the Annex B.7 normative code tables — see SURVEY_COVERAGE.md's
    * refusal row for why that stays out of scope in this build. */
  final case class Mp3SideInfo(sampleRate: Int, bitrateKbps: Int,
                               channels: Int, mainDataBegin: Int,
                               scfsi: Array[Int],
                               granules: Array[Array[Mp3Granule]])

  /** Parse the Layer III side info of the first frame (after ID3v2). */
  def decodeLayer3Side(p: Array[Byte]): Mp3SideInfo = {
    val off = id3v2Length(p)
    val fh = parseFrameHeader(p, off).getOrElse(
      throw new IllegalArgumentException("no valid frame header"))
    require(fh.version == 1 && fh.layer == 3,
      s"not an MPEG-1 Layer III frame (v${fh.version} L${fh.layer})")
    val br = new BitReader(p, (off + 4 + (if (fh.crc) 2 else 0)).toLong * 8)
    val nch = fh.channels
    val mainDataBegin = br.read(9)
    br.read(if (nch == 1) 5 else 3) // private_bits
    val scfsi = Array.fill(nch)(br.read(4))
    val granules = Array.fill(2)(Array.fill(nch) {
      val p23 = br.read(12)
      val bv = br.read(9)
      val gg = br.read(8)
      val sfc = br.read(4)
      val switching = br.read(1) == 1
      val (bt, mixed, ts, sbg, r0, r1) =
        if (switching) {
          val bt = br.read(2)
          val mx = br.read(1) == 1
          val ts = Array(br.read(5), br.read(5))
          val sbg = Array(br.read(3), br.read(3), br.read(3))
          (bt, mx, ts, sbg, -1, -1) // region counts absent from the stream
        } else {
          val ts = Array(br.read(5), br.read(5), br.read(5))
          (0, false, ts, Array.empty[Int], br.read(4), br.read(3))
        }
      Mp3Granule(p23, bv, gg, sfc, switching, bt, mixed, ts, sbg, r0, r1,
        br.read(1), br.read(1), br.read(1))
    })
    Mp3SideInfo(fh.sampleRate, fh.bitrateKbps, nch, mainDataBegin, scfsi,
      granules)
  }

  // ------------------------------------------------------------- synth

  private final class BitWriter(val buf: Array[Byte]) {
    private var bitPos = 0L
    def seekByte(b: Int): Unit = bitPos = b.toLong * 8
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        val bit = (v >> i) & 1
        val bi = (bitPos >> 3).toInt
        buf(bi) = (buf(bi) | (bit << (7 - (bitPos & 7)).toInt)).toByte
        bitPos += 1; i -= 1
      }
    }
  }

  private def header(versionBits: Int, layerBits: Int, bitrateIdx: Int,
                     srIdx: Int, mode: Int): Array[Int] = Array(
    0xff,
    0xe0 | (versionBits << 3) | (layerBits << 1) | 1, // no CRC
    (bitrateIdx << 4) | (srIdx << 2),                 // no padding
    mode << 6)

  /** `n` marker-valid MPEG-1 Layer III frames (header + zero body) —
    * the synthesis side of the [[mp3Meta]] walk. */
  def mp3SynthFrames(n: Int, bitrateIdx: Int, srIdx: Int): Array[Byte] = {
    require(n >= 1 && bitrateIdx >= 1 && bitrateIdx <= 14 && srIdx >= 0 &&
      srIdx <= 2, "out of range")
    val kbps = kbpsV1(2)(bitrateIdx)
    val frameBytes = 144 * kbps * 1000 / srV1(srIdx)
    val out = new Array[Byte](frameBytes * n)
    val h = header(3, 1, bitrateIdx, srIdx, mode = 3)
    var f = 0
    while (f < n) {
      var i = 0
      while (i < 4) { out(f * frameBytes + i) = h(i).toByte; i += 1 }
      f += 1
    }
    out
  }

  /** One MPEG-1 Layer III MONO frame carrying the given side-info
    * fields (part2_3_length = 0: an all-zero spectrum needs no main
    * data, which is legal and keeps the frame fully specified without
    * the Huffman tables). `gr(i)` supplies granule i; switched
    * granules write the 2+1+2·5+3·3 branch, long granules the
    * 3·5+4+3 branch. The synthesis side of [[decodeLayer3Side]]. */
  def mp3SynthSide(mainDataBegin: Int, scfsi: Int, gr: Array[Mp3Granule],
                   bitrateIdx: Int = 8, srIdx: Int = 2): Array[Byte] = {
    require(gr.length == 2, "two granules")
    require(mainDataBegin >= 0 && mainDataBegin < 512 &&
      scfsi >= 0 && scfsi < 16, "out of range")
    val kbps = kbpsV1(2)(bitrateIdx)
    val frameBytes = 144 * kbps * 1000 / srV1(srIdx)
    val buf = new Array[Byte](frameBytes)
    val h = header(3, 1, bitrateIdx, srIdx, mode = 3)
    var i = 0
    while (i < 4) { buf(i) = h(i).toByte; i += 1 }
    val w = new BitWriter(buf)
    w.seekByte(4)
    w.write(mainDataBegin, 9)
    w.write(0, 5) // private_bits (mono)
    w.write(scfsi, 4)
    gr.foreach { g =>
      require(g.part23Length == 0, "synth carries no main data")
      require(g.bigValues >= 0 && g.bigValues <= 288 &&
        g.globalGain >= 0 && g.globalGain < 256 &&
        g.scalefacCompress >= 0 && g.scalefacCompress < 16, "out of range")
      w.write(0, 12) // part2_3_length
      w.write(g.bigValues, 9)
      w.write(g.globalGain, 8)
      w.write(g.scalefacCompress, 4)
      w.write(if (g.windowSwitching) 1 else 0, 1)
      // BitWriter silently keeps only the low n bits of each field, so
      // every field is range-guarded — an out-of-range input must fail
      // HERE, not produce a frame that decodes to different values and
      // breaks the documented synth->decode roundtrip silently
      require(g.preflag >= 0 && g.preflag < 2 &&
        g.scalefacScale >= 0 && g.scalefacScale < 2 &&
        g.count1Table >= 0 && g.count1Table < 2,
        "1-bit fields must be 0 or 1")
      require(g.tableSelect.forall(t => t >= 0 && t < 32),
        "table_select is 5 bits")
      if (g.windowSwitching) {
        require(g.tableSelect.length == 2 && g.subblockGain.length == 3,
          "switched granule needs 2 table selects + 3 subblock gains")
        require(g.blockType >= 1 && g.blockType < 4,
          "switched block_type is 2 bits and 0 is forbidden " +
            "(11172-3: block_type 0 with window_switching_flag set " +
            "is invalid)")
        require(g.subblockGain.forall(s => s >= 0 && s < 8),
          "subblock_gain is 3 bits")
        w.write(g.blockType, 2)
        w.write(if (g.mixedBlock) 1 else 0, 1)
        g.tableSelect.foreach(t => w.write(t, 5))
        g.subblockGain.foreach(s => w.write(s, 3))
      } else {
        require(g.tableSelect.length == 3 &&
          g.region0Count >= 0 && g.region0Count < 16 &&
          g.region1Count >= 0 && g.region1Count < 8,
          "long granule needs 3 table selects + region counts")
        g.tableSelect.foreach(t => w.write(t, 5))
        w.write(g.region0Count, 4)
        w.write(g.region1Count, 3)
      }
      w.write(g.preflag, 1)
      w.write(g.scalefacScale, 1)
      w.write(g.count1Table, 1)
    }
    buf
  }

  /** One MPEG-1 Layer II MONO frame (allocation table B.2a) with a
    * single allocated subband: allocation index `allocIdx` into the
    * subband's B.2a class, scfsi mode, up to three 6-bit scalefactor
    * indices (consumed per the scfsi contract), and 36 sample codes
    * from `code(s)` (packed into triplet group codes when the level
    * count is 3/5/9). The synthesis side of [[decodeLayer2]]. */
  def mp2Synth(activeSb: Int, allocIdx: Int, scfsi: Int,
               sfIdx: Array[Int], code: Int => Int,
               bitrateIdx: Int = 8, srIdx: Int = 2): Array[Byte] = {
    require(activeSb >= 0 && activeSb < L2SbLimit, "subband out of range")
    val levelsTab = l2LevelsClass(l2Class(activeSb))
    require(allocIdx >= 1 && allocIdx <= levelsTab.length,
      s"allocIdx out of range for subband $activeSb")
    require(scfsi >= 0 && scfsi <= 3, "scfsi out of range")
    require(sfIdx.forall(i => i >= 0 && i < 63), "scalefactor out of range")
    val levels = levelsTab(allocIdx - 1)
    val (bits, grouped) = l2CodeBits(levels)
    val kbps = kbpsV1(1)(bitrateIdx)
    val frameBytes = 144 * kbps * 1000 / srV1(srIdx)
    val buf = new Array[Byte](frameBytes)
    val h = header(3, 2, bitrateIdx, srIdx, mode = 3)
    var i = 0
    while (i < 4) { buf(i) = h(i).toByte; i += 1 }
    val w = new BitWriter(buf)
    w.seekByte(4)
    var sb = 0
    while (sb < L2SbLimit) {
      w.write(if (sb == activeSb) allocIdx else 0, l2Nbal(sb))
      sb += 1
    }
    w.write(scfsi, 2)
    val nSf = scfsi match {
      case 0 => 3
      case 2 => 1
      case _ => 2
    }
    i = 0
    while (i < nSf) { w.write(sfIdx(i), 6); i += 1 }
    var gr = 0
    while (gr < 12) {
      if (grouped) {
        var c = 0
        var k = 2
        while (k >= 0) {
          val s = code(gr * 3 + k)
          require(s >= 0 && s < levels, s"code out of range at ${gr * 3 + k}")
          c = c * levels + s
          k -= 1
        }
        w.write(c, bits)
      } else {
        var k = 0
        while (k < 3) {
          val s = code(gr * 3 + k)
          require(s >= 0 && s < levels, s"code out of range at ${gr * 3 + k}")
          w.write(s, bits)
          k += 1
        }
      }
      gr += 1
    }
    buf
  }

  /** One MPEG-1 Layer I MONO frame with a single allocated subband:
    * allocation `a` (nb = a + 1 bits), scalefactor index `sfIdx`, and
    * the 12 codes produced by `code(s)`. The synthesis side of
    * [[decodeLayer1]]; every other subband is silent. */
  def mp1Synth(activeSb: Int, a: Int, sfIdx: Int, code: Int => Int,
               bitrateIdx: Int = 4, srIdx: Int = 2): Array[Byte] = {
    require(activeSb >= 0 && activeSb < 32 && a >= 1 && a <= 14 &&
      sfIdx >= 0 && sfIdx < 63, "out of range")
    val kbps = kbpsV1(0)(bitrateIdx)
    val frameBytes = 12 * kbps * 1000 / srV1(srIdx) * 4
    val buf = new Array[Byte](frameBytes)
    val h = header(3, 3, bitrateIdx, srIdx, mode = 3)
    var i = 0
    while (i < 4) { buf(i) = h(i).toByte; i += 1 }
    val w = new BitWriter(buf)
    w.seekByte(4)
    var sb = 0
    while (sb < 32) { w.write(if (sb == activeSb) a else 0, 4); sb += 1 }
    w.write(sfIdx, 6)
    val nb = a + 1
    var s = 0
    while (s < 12) {
      val c = code(s)
      require(c >= 0 && c < (1 << nb), s"code out of range at $s")
      w.write(c, nb)
      s += 1
    }
    buf
  }
}
