package graft.operators

/** Baseline sequential JPEG (ITU-T T.81) codec in pure JVM arithmetic —
  * no codec library: Huffman entropy coding, zigzag, quantization,
  * 8x8 DCT/IDCT (double-precision separable), YCbCr<->RGB, 4:4:4 and
  * 4:2:0 chroma sampling, restart markers, byte stuffing.
  *
  * This retires the engine's last declared multimodal stub (see
  * [[Multimodal.decodeStub]], which now stands in for MP3 audio only):
  * JPEG needs no external library — like round 4's PNG work (zlib is in
  * the JDK), baseline JPEG is integer/double arithmetic end to end.
  *
  * Scope: baseline DCT (SOF0), extended sequential (SOF1), and — since
  * round 6 — full progressive (SOF2: spectral selection + successive
  * approximation, [[decodeProgressive]]) Huffman streams; 8-bit
  * precision, 1 or 3 components, sampling factors 1-2, DRI/RSTn.
  * [[decode]] dispatches on the SOF marker. Arithmetic coding, 12-bit,
  * and hierarchical streams throw IllegalArgumentException — callers
  * surface `valid = false` rather than mis-decoding.
  *
  * Determinism contract (what the DuckDB oracle relies on): every
  * rounding site is `floor(x + 0.5)` on IEEE doubles with the literal
  * constants written below, so an independent engine evaluating the
  * same expressions reproduces the decoder bit-for-bit.
  */
object Jpeg {

  // ------------------------------------------------------------ constants

  /** Zigzag scan order: zigzag position -> natural (row*8+col) index. */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Spec Annex K luminance/chrominance quantization tables (natural
    * order), the public defaults every camera ships. */
  val StdQuantLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  val StdQuantChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** All-ones table: quantization becomes the identity, so patterns whose
    * DCT coefficients are exact integers roundtrip bit-exactly. */
  val QuantUnit: Array[Int] = Array.fill(64)(1)

  /** Scale a base table by libjpeg's quality convention (1..100). */
  def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, "quality in 1..100")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(q => math.min(255, math.max(1, (q * scale + 50) / 100)))
  }

  /** ct(u)(x) = C(u) * cos((2x+1) u pi / 16), the orthonormal DCT basis
    * (C(0)=1/sqrt2, else 1) shared by FDCT and IDCT. */
  private val ct: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ------------------------------------------------------------- DCT pair

  /** Forward 8x8 DCT of level-shifted samples (natural order in/out). */
  def fdctBlock(s: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64) // rows transformed: tmp(y*8+u)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) { acc += s(y * 8 + x) * ct(u)(x); x += 1 }
        tmp(y * 8 + u) = acc
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](64) // F(v*8+u)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < 8) { acc += tmp(yy * 8 + u) * ct(v)(yy); yy += 1 }
        out(v * 8 + u) = 0.25 * acc
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse 8x8 DCT of dequantized coefficients (natural order) to
    * level-shifted spatial doubles. */
  def idctBlock(coef: Array[Int]): Array[Double] = {
    val tmp = new Array[Double](64) // tmp(v*8+x) = sum_u F(v,u) ct(u)(x)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += coef(v * 8 + u) * ct(u)(x); u += 1 }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    val out = new Array[Double](64) // s(y*8+x)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var vv = 0
        while (vv < 8) { acc += tmp(vv * 8 + x) * ct(vv)(y); vv += 1 }
        out(y * 8 + x) = 0.25 * acc
        x += 1
      }
      y += 1
    }
    out
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  // --------------------------------------------------- Huffman (encoder)

  /** Build an optimal length-limited Huffman table from symbol
    * frequencies, per the public T.81 Annex K.2/K.3 procedure (reserved
    * all-ones code, >16-bit down-shift). Returns (bits(1..16), huffval
    * sorted by code length then symbol). */
  def buildHuffman(freqIn: Array[Int]): (Array[Int], Array[Int]) = {
    val freq = new Array[Long](257)
    var i = 0
    while (i < 256) { freq(i) = freqIn(i).toLong; i += 1 }
    freq(256) = 1 // reserves the all-ones code
    val codesize = new Array[Int](257)
    val others = Array.fill(257)(-1)
    var merging = true
    while (merging) {
      var v1 = -1
      i = 0
      while (i <= 256) {
        if (freq(i) > 0 &&
            (v1 < 0 || freq(i) < freq(v1) || (freq(i) == freq(v1) && i > v1)))
          v1 = i
        i += 1
      }
      var v2 = -1
      i = 0
      while (i <= 256) {
        if (i != v1 && freq(i) > 0 &&
            (v2 < 0 || freq(i) < freq(v2) || (freq(i) == freq(v2) && i > v2)))
          v2 = i
        i += 1
      }
      if (v2 < 0) merging = false
      else {
        freq(v1) += freq(v2); freq(v2) = 0
        codesize(v1) += 1
        var t = v1
        while (others(t) >= 0) { t = others(t); codesize(t) += 1 }
        others(t) = v2
        codesize(v2) += 1
        t = v2
        while (others(t) >= 0) { t = others(t); codesize(t) += 1 }
      }
    }
    val bits = new Array[Int](33)
    i = 0
    while (i <= 256) { if (codesize(i) > 0) bits(codesize(i)) += 1; i += 1 }
    var l = 32
    while (l > 16) { // push over-long codes up the tree
      while (bits(l) > 0) {
        var j = l - 2
        while (bits(j) == 0) j -= 1
        bits(l) -= 2; bits(l - 1) += 1; bits(j + 1) += 2; bits(j) -= 1
      }
      l -= 1
    }
    var k = 16
    while (k > 0 && bits(k) == 0) k -= 1
    if (k > 0) bits(k) -= 1 // drop the reserved symbol's code
    val huffval = (1 to 32).iterator.flatMap { len =>
      (0 until 256).iterator.filter(s => codesize(s) == len)
    }.toArray
    (bits.slice(1, 17), huffval)
  }

  /** Canonical code assignment: symbol -> (code, length). */
  private def assignCodes(bits: Array[Int], huffval: Array[Int])
      : Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var n = 0
      while (n < bits(l - 1)) {
        table(huffval(k)) = (code, l)
        code += 1; k += 1; n += 1
      }
      code <<= 1
      l += 1
    }
    table
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(value: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 B.1.1.5). */
    def flush(): Unit = if (nbits > 0) {
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  private def bitSize(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  // ------------------------------------------------------------- encoder

  /** One component plane, padded to full MCU coverage (dims multiples of
    * 8*sampling over the MCU grid); values 0..255 row-major. */
  final case class EncPlane(w: Int, h: Int, data: Array[Int])

  /** Encode a baseline sequential JFIF-style stream: SOI, DQT, SOF0, DHT
    * (optimal per-image Huffman tables), optional DRI, one interleaved
    * SOS, EOI. `planes` is 1 (grayscale) or 3 (YCbCr); component 0 uses
    * the luma quant/Huffman tables, 1-2 the chroma ones. */
  def encodeBaseline(width: Int, height: Int, planes: Seq[EncPlane],
                     sampling: Seq[(Int, Int)],
                     quantLuma: Array[Int] = QuantUnit,
                     quantChroma: Array[Int] = QuantUnit,
                     restartInterval: Int = 0): Array[Byte] = {
    val nc = planes.length
    require(nc == 1 || nc == 3, "1 or 3 components")
    require(sampling.length == nc, "one sampling factor pair per plane")
    require(width > 0 && height > 0, "positive dimensions")
    sampling.foreach { case (h, v) =>
      require(h >= 1 && h <= 2 && v >= 1 && v <= 2, "sampling factors 1-2")
    }
    val hMax = sampling.map(_._1).max
    val vMax = sampling.map(_._2).max
    val mcusX = ceilDiv(width, 8 * hMax)
    val mcusY = ceilDiv(height, 8 * vMax)
    planes.zip(sampling).foreach { case (p, (sh, sv)) =>
      require(p.w == mcusX * 8 * sh && p.h == mcusY * 8 * sv,
        s"plane must be padded to ${mcusX * 8 * sh}x${mcusY * 8 * sv}, " +
          s"got ${p.w}x${p.h}")
      require(p.data.length == p.w * p.h, "plane data length mismatch")
    }

    // pass 1: quantized coefficients for every block, in scan order
    val quantOf = (c: Int) => if (c == 0) quantLuma else quantChroma
    // blocks(mcu)(slot) = coefficients natural order; slot enumerates
    // components x their v*h blocks in interleave order
    val slotComp = (0 until nc).flatMap { c =>
      Seq.fill(sampling(c)._1 * sampling(c)._2)(c)
    }
    val nMcus = mcusX * mcusY
    val blocks = new Array[Array[Array[Int]]](nMcus)
    var m = 0
    while (m < nMcus) {
      val mx = m % mcusX; val my = m / mcusX
      val buf = new Array[Array[Int]](slotComp.length)
      var slot = 0
      var c = 0
      while (c < nc) {
        val (sh, sv) = sampling(c)
        val plane = planes(c)
        val q = quantOf(c)
        var bv = 0
        while (bv < sv) {
          var bh = 0
          while (bh < sh) {
            val ox = (mx * sh + bh) * 8
            val oy = (my * sv + bv) * 8
            val s = new Array[Double](64)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                s(y * 8 + x) = plane.data((oy + y) * plane.w + ox + x) - 128.0
                x += 1
              }
              y += 1
            }
            val f = fdctBlock(s)
            val qc = new Array[Int](64)
            var i = 0
            while (i < 64) {
              qc(i) = math.round(f(i) / q(i)).toInt
              i += 1
            }
            buf(slot) = qc
            slot += 1; bh += 1
          }
          bv += 1
        }
        c += 1
      }
      blocks(m) = buf
      m += 1
    }

    // pass 2: symbol frequencies -> optimal tables
    val dcFreq = Array.fill(2)(new Array[Int](256))
    val acFreq = Array.fill(2)(new Array[Int](256))
    val tblOf = (c: Int) => if (c == 0) 0 else 1
    locally { // record symbol frequencies for optimal-table construction
      val pred = new Array[Int](nc)
      var mcu = 0
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0)
          java.util.Arrays.fill(pred, 0)
        val buf = blocks(mcu)
        var slot = 0
        while (slot < buf.length) {
          val c = slotComp(slot)
          val t = tblOf(c)
          val qc = buf(slot)
          val diff = qc(0) - pred(c)
          pred(c) = qc(0)
          dcFreq(t)(if (diff == 0) 0 else bitSize(math.abs(diff))) += 1
          var run = 0
          var k = 1
          while (k < 64) {
            val v = qc(Zigzag(k))
            if (v == 0) run += 1
            else {
              while (run > 15) { acFreq(t)(0xf0) += 1; run -= 16 }
              acFreq(t)((run << 4) | bitSize(math.abs(v))) += 1
              run = 0
            }
            k += 1
          }
          if (run > 0) acFreq(t)(0x00) += 1
          slot += 1
        }
        mcu += 1
      }
    }
    val nTbl = if (nc == 1) 1 else 2
    val dcTables = (0 until nTbl).map(t => buildHuffman(dcFreq(t)))
    val acTables = (0 until nTbl).map(t => buildHuffman(acFreq(t)))
    val dcCodes = dcTables.map { case (b, v) => assignCodes(b, v) }
    val acCodes = acTables.map { case (b, v) => assignCodes(b, v) }

    // emit the stream
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    // DQT
    marker(0xdb); u16(2 + nTbl * 65)
    var t = 0
    while (t < nTbl) {
      u8(t) // 8-bit precision, table id
      val q = if (t == 0) quantLuma else quantChroma
      var k = 0
      while (k < 64) { u8(q(Zigzag(k))); k += 1 }
      t += 1
    }
    // SOF0
    marker(0xc0); u16(8 + 3 * nc); u8(8); u16(height); u16(width); u8(nc)
    var c = 0
    while (c < nc) {
      u8(c + 1); u8((sampling(c)._1 << 4) | sampling(c)._2); u8(tblOf(c))
      c += 1
    }
    // DHT
    def dht(clazz: Int, id: Int, tab: (Array[Int], Array[Int])): Unit = {
      val (bits, huffval) = tab
      marker(0xc4); u16(2 + 1 + 16 + huffval.length)
      u8((clazz << 4) | id)
      bits.foreach(u8)
      huffval.foreach(u8)
    }
    t = 0
    while (t < nTbl) {
      dht(0, t, dcTables(t)); dht(1, t, acTables(t)); t += 1
    }
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    // SOS
    marker(0xda); u16(6 + 2 * nc); u8(nc)
    c = 0
    while (c < nc) { u8(c + 1); u8((tblOf(c) << 4) | tblOf(c)); c += 1 }
    u8(0); u8(63); u8(0)
    // entropy-coded data, RSTn between restart intervals
    val bw = new BitWriter(out)
    val pred = new Array[Int](nc)
    var rstIdx = 0
    var mcu = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        marker(0xd0 + rstIdx % 8)
        rstIdx += 1
        java.util.Arrays.fill(pred, 0)
      }
      val buf = blocks(mcu)
      var slot = 0
      while (slot < buf.length) {
        val comp = slotComp(slot)
        val tbl = tblOf(comp)
        val qc = buf(slot)
        val diff = qc(0) - pred(comp)
        pred(comp) = qc(0)
        val dsz = if (diff == 0) 0 else bitSize(math.abs(diff))
        val (dCode, dLen) = dcCodes(tbl)(dsz)
        bw.put(dCode, dLen)
        if (dsz > 0)
          bw.put(if (diff < 0) diff + (1 << dsz) - 1 else diff, dsz)
        var run = 0
        var k = 1
        while (k < 64) {
          val v = qc(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run > 15) {
              val (zc, zl) = acCodes(tbl)(0xf0); bw.put(zc, zl); run -= 16
            }
            val sz = bitSize(math.abs(v))
            val (aCode, aLen) = acCodes(tbl)((run << 4) | sz)
            bw.put(aCode, aLen)
            bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = acCodes(tbl)(0x00); bw.put(ec, el) }
        slot += 1
      }
      mcu += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------- decoder

  /** Decoded image: logical dims + row-major RGB bytes (grayscale is
    * replicated across channels). */
  final case class JpegImage(width: Int, height: Int, rgb: Array[Byte])

  private final class HuffTable(bits: Array[Int], huffval: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      require(k == huffval.length, "DHT bits/huffval mismatch")
    }
    def decode(br: BitReader): Int = {
      var l = 1
      var code = br.nextBit()
      while (code > maxcode(l)) {
        l += 1
        require(l <= 16, "invalid Huffman code")
        code = (code << 1) | br.nextBit()
      }
      huffval(valptr(l) + (code - mincode(l)))
    }
  }

  private final class BitReader(p: Array[Byte], private var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bytePos: Int = pos
    def nextBit(): Int = {
      if (nbits == 0) {
        require(pos < p.length, "truncated entropy stream")
        var b = p(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < p.length, "truncated entropy stream")
          val b2 = p(pos) & 0xff
          if (b2 == 0x00) pos += 1 // stuffed 0xFF data byte
          else throw new IllegalArgumentException(
            f"marker 0xFF$b2%02x inside entropy stream")
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nbits = 0
      require(pos + 1 < p.length, "truncated at restart")
      require((p(pos) & 0xff) == 0xff &&
        (p(pos + 1) & 0xff) == (0xd0 + expected),
        "missing/misnumbered RST marker")
      pos += 2
    }
  }

  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  /** Full baseline JPEG decode to RGB. Throws IllegalArgumentException on
    * malformed, truncated, or out-of-scope (progressive/arithmetic/12-bit)
    * input. */
  def decodeBaseline(p: Array[Byte]): JpegImage = {
    require(p != null && p.length >= 4 &&
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8, "not a JPEG")
    var pos = 2
    def be16(o: Int): Int = {
      require(o + 2 <= p.length, "truncated segment")
      ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
    }
    val quant = new Array[Array[Int]](4)
    val dcTab = new Array[HuffTable](4)
    val acTab = new Array[HuffTable](4)
    var width = 0; var height = 0
    // per component: id, sh, sv, quant id, dc table id, ac table id
    var compId: Array[Int] = null
    var compSh: Array[Int] = null
    var compSv: Array[Int] = null
    var compQ: Array[Int] = null
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var restartInterval = 0
    var sawSof = false

    var scanStart = -1
    while (scanStart < 0) {
      require(pos + 2 <= p.length, "truncated before SOS")
      require((p(pos) & 0xff) == 0xff, "lost marker sync")
      val m = p(pos + 1) & 0xff
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2
      else if (m == 0xd9) throw new IllegalArgumentException("EOI before SOS")
      else {
        val len = be16(pos + 2)
        require(len >= 2 && pos + 2 + len <= p.length, "bad segment length")
        val seg = pos + 4
        val segLen = len - 2
        m match {
          case 0xc0 | 0xc1 => // baseline / extended sequential, Huffman
            require(segLen >= 6, "short SOF")
            require((p(seg) & 0xff) == 8, "only 8-bit precision supported")
            height = be16(seg + 1); width = be16(seg + 3)
            val nc = p(seg + 5) & 0xff
            require(nc == 1 || nc == 3, "1 or 3 components supported")
            require(segLen >= 6 + 3 * nc, "short SOF component list")
            require(width > 0 && height > 0, "bad dimensions")
            require(width.toLong * height <= 64L * 1024 * 1024,
              "image too large") // bounds allocation on crafted headers
            compId = new Array[Int](nc); compSh = new Array[Int](nc)
            compSv = new Array[Int](nc); compQ = new Array[Int](nc)
            compDc = new Array[Int](nc); compAc = new Array[Int](nc)
            var c = 0
            while (c < nc) {
              compId(c) = p(seg + 6 + 3 * c) & 0xff
              val sf = p(seg + 7 + 3 * c) & 0xff
              compSh(c) = sf >> 4; compSv(c) = sf & 0x0f
              require(compSh(c) >= 1 && compSh(c) <= 2 &&
                compSv(c) >= 1 && compSv(c) <= 2,
                "sampling factors 1-2 supported")
              compQ(c) = p(seg + 8 + 3 * c) & 0xff
              require(compQ(c) < 4, "bad quant table id")
              c += 1
            }
            sawSof = true
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            throw new IllegalArgumentException(
              f"unsupported SOF marker 0xFF$m%02x (progressive/arithmetic/" +
                "lossless)")
          case 0xc4 => // DHT
            var o = seg
            while (o < seg + segLen) {
              require(o + 17 <= seg + segLen, "short DHT")
              val tc = (p(o) & 0xff) >> 4
              val th = p(o) & 0x0f
              require(tc <= 1 && th < 4, "bad DHT header")
              val bits = Array.tabulate(16)(i => p(o + 1 + i) & 0xff)
              val n = bits.sum
              require(n <= 256 && o + 17 + n <= seg + segLen, "bad DHT count")
              val huffval = Array.tabulate(n)(i => p(o + 17 + i) & 0xff)
              val tab = new HuffTable(bits, huffval)
              if (tc == 0) dcTab(th) = tab else acTab(th) = tab
              o += 17 + n
            }
          case 0xdb => // DQT
            var o = seg
            while (o < seg + segLen) {
              val pq = (p(o) & 0xff) >> 4
              val tq = p(o) & 0x0f
              require(pq <= 1 && tq < 4, "bad DQT header")
              val n = if (pq == 0) 64 else 128
              require(o + 1 + n <= seg + segLen, "short DQT")
              val q = new Array[Int](64)
              var k = 0
              while (k < 64) {
                q(Zigzag(k)) =
                  if (pq == 0) p(o + 1 + k) & 0xff
                  else ((p(o + 1 + 2 * k) & 0xff) << 8) |
                    (p(o + 2 + 2 * k) & 0xff)
                k += 1
              }
              quant(tq) = q
              o += 1 + n
            }
          case 0xdd => // DRI: marker length 4 = 2-byte interval payload
            require(segLen >= 2, "short DRI")
            restartInterval = be16(seg)
          case 0xda => // SOS
            require(sawSof, "SOS before SOF")
            val ns = p(seg) & 0xff
            require(ns == compId.length,
              "only single interleaved scan supported")
            var c = 0
            while (c < ns) {
              val id = p(seg + 1 + 2 * c) & 0xff
              val idx = compId.indexOf(id)
              require(idx >= 0, "SOS names unknown component")
              val tt = p(seg + 2 + 2 * c) & 0xff
              compDc(idx) = tt >> 4; compAc(idx) = tt & 0x0f
              c += 1
            }
            scanStart = pos + 2 + len
          case _ => () // APPn / COM / others skipped
        }
        if (scanStart < 0) pos += 2 + len
      }
    }

    val nc = compId.length
    val hMax = compSh.max
    val vMax = compSv.max
    val mcusX = ceilDiv(width, 8 * hMax)
    val mcusY = ceilDiv(height, 8 * vMax)
    // padded component planes
    val planeW = Array.tabulate(nc)(c => mcusX * 8 * compSh(c))
    val planeH = Array.tabulate(nc)(c => mcusY * 8 * compSv(c))
    val planes = Array.tabulate(nc)(c => new Array[Int](planeW(c) * planeH(c)))
    (0 until nc).foreach { c =>
      require(quant(compQ(c)) != null, "missing quant table")
      require(dcTab(compDc(c)) != null && acTab(compAc(c)) != null,
        "missing Huffman table")
    }

    val br = new BitReader(p, scanStart)
    val pred = new Array[Int](nc)
    val coef = new Array[Int](64)
    var rstCount = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart(rstCount % 8)
        rstCount += 1
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var c = 0
      while (c < nc) {
        val q = quant(compQ(c))
        val dct = dcTab(compDc(c))
        val act = acTab(compAc(c))
        var bv = 0
        while (bv < compSv(c)) {
          var bh = 0
          while (bh < compSh(c)) {
            java.util.Arrays.fill(coef, 0)
            val dsz = dct.decode(br)
            require(dsz <= 11, "bad DC size")
            val diff = extend(br.receive(dsz), dsz)
            pred(c) += diff
            coef(0) = pred(c) * q(0)
            var k = 1
            while (k < 64) {
              val sym = act.decode(br)
              if (sym == 0x00) k = 64 // EOB
              else if (sym == 0xf0) k += 16 // ZRL
              else {
                k += sym >> 4
                require(k < 64, "AC run overflows block")
                val sz = sym & 0x0f
                val nat = Zigzag(k)
                coef(nat) = extend(br.receive(sz), sz) * q(nat)
                k += 1
              }
            }
            val s = idctBlock(coef)
            val plane = planes(c)
            val ox = (mx * compSh(c) + bh) * 8
            val oy = (my * compSv(c) + bv) * 8
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                plane((oy + y) * planeW(c) + ox + x) =
                  clamp255(math.floor(s(y * 8 + x) + 128.0 + 0.5).toInt)
                x += 1
              }
              y += 1
            }
            bh += 1
          }
          bv += 1
        }
        c += 1
      }
      mcu += 1
    }
    // a well-formed baseline stream closes the single scan with EOI, but
    // T.81 B.1.1.2 permits any number of 0xFF fill bytes before a marker
    // and real-world writers also emit trailing COM/APPn/DNL segments
    // between the scan and EOI — tolerate both instead of demanding EOI
    // at the exact byte position (rejecting such files would silently
    // drop conformant web-corpus payloads as undecodable)
    locally {
      var at = br.bytePos
      var foundEoi = false
      var guard = 0
      while (!foundEoi && guard < 64) {
        require(at + 2 <= p.length && (p(at) & 0xff) == 0xff,
          "missing EOI after scan")
        while (at + 1 < p.length && (p(at + 1) & 0xff) == 0xff)
          at += 1 // fill bytes
        require(at + 2 <= p.length, "missing EOI after scan")
        val m = p(at + 1) & 0xff
        if (m == 0xd9) foundEoi = true
        else {
          // a trailing marker segment (COM/APPn/DNL…) with 2-byte length;
          // bare markers (RST, stuffed 0x00) are invalid after the scan
          require(m != 0 && (m < 0xd0 || m > 0xd7),
            "unexpected marker after scan")
          require(at + 4 <= p.length, "truncated post-scan segment")
          val len = ((p(at + 2) & 0xff) << 8) | (p(at + 3) & 0xff)
          require(len >= 2, "bad post-scan segment length")
          at += 2 + len
        }
        guard += 1
      }
      require(foundEoi, "missing EOI after scan")
    }

    planesToRgb(width, height, planes, planeW, compSh, compSv, hMax, vMax)
  }

  /** Upsample (replication) + YCbCr->RGB color convert of decoded
    * component planes — shared by the sequential and progressive paths. */
  private def planesToRgb(width: Int, height: Int,
                          planes: Array[Array[Int]], planeW: Array[Int],
                          compSh: Array[Int], compSv: Array[Int],
                          hMax: Int, vMax: Int): JpegImage = {
    val nc = planes.length
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        if (nc == 1) {
          val v = planes(0)(y * planeW(0) + x).toByte
          rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
        } else {
          def sample(c: Int): Int = {
            val sx = x * compSh(c) / hMax
            val sy = y * compSv(c) / vMax
            planes(c)(sy * planeW(c) + sx)
          }
          val yv = sample(0); val cb = sample(1); val cr = sample(2)
          rgb(o) = clamp255(
            math.floor(yv + 1.402 * (cr - 128) + 0.5).toInt).toByte
          rgb(o + 1) = clamp255(math.floor(
            yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5).toInt)
            .toByte
          rgb(o + 2) = clamp255(
            math.floor(yv + 1.772 * (cb - 128) + 0.5).toInt).toByte
        }
        x += 1
      }
      y += 1
    }
    JpegImage(width, height, rgb)
  }

  // --------------------------------------------- deterministic synthesis

  /** s4(x) = sign of cos((2x+1)pi/4): +1 for x%8 in {0,3,4,7}, else -1.
    * The (4,0)/(0,4)/(4,4) DCT basis functions are exactly +-1/2 times
    * sign patterns, so blocks built from them have exactly-integer
    * coefficients — the lever that makes a lossy codec oracle-exact. */
  def s4(x: Int): Int = if ((x % 8) == 0 || (x % 8) == 3 ||
    (x % 8) == 4 || (x % 8) == 7) 1 else -1

  /** Deterministic YCbCr planes (padded to `pw` x `ph`) whose every 8x8
    * block is `v + a*s4(x) + b*s4(y) + c*s4(x)*s4(y)` with small integer
    * a/b/c — in the exact-integer-DCT span, so encodeBaseline with
    * QuantUnit roundtrips bit-for-bit and the DuckDB oracle can replay
    * the closed form. Mirrors [[Multimodal.rgbSynthPixels]]'s role. */
  def jpegSynthPlanes(id: Long, pw: Int, ph: Int)
      : (EncPlane, EncPlane, EncPlane) = {
    val idi = (id % 1000).toInt
    val yP = new Array[Int](pw * ph)
    val cbP = new Array[Int](pw * ph)
    val crP = new Array[Int](pw * ph)
    var y = 0
    while (y < ph) {
      var x = 0
      while (x < pw) {
        val bx = x / 8; val by = y / 8
        val sx = s4(x); val sy = s4(y)
        yP(y * pw + x) = 40 + (bx * 29 + by * 17 + idi * 3) % 176 +
          ((bx + by + idi) % 7 - 3) * sx +
          ((2 * bx + by + idi) % 5 - 2) * sy +
          ((bx + 2 * by + idi) % 3 - 1) * sx * sy
        cbP(y * pw + x) = 70 + (13 * bx + 7 * by + 5 * idi) % 116 +
          ((bx + idi) % 3 - 1) * sx + ((by + idi) % 3 - 1) * sy
        crP(y * pw + x) = 70 + (11 * bx + 19 * by + 7 * idi) % 116 +
          ((by + idi) % 3 - 1) * sx + ((bx + 2 * idi) % 3 - 1) * sy
        x += 1
      }
      y += 1
    }
    (EncPlane(pw, ph, yP), EncPlane(pw, ph, cbP), EncPlane(pw, ph, crP))
  }

  /** A complete deterministic baseline JPEG for `id`: 4:4:4, unit quant,
    * restart interval 2 for every 4th id (exercises RSTn on decode). */
  def jpegSynth(id: Long, w: Int, h: Int): Array[Byte] = {
    val pw = ceilDiv(w, 8) * 8
    val ph = ceilDiv(h, 8) * 8
    val (yP, cbP, crP) = jpegSynthPlanes(id, pw, ph)
    encodeBaseline(w, h, Seq(yP, cbP, crP), Seq((1, 1), (1, 1), (1, 1)),
      QuantUnit, QuantUnit,
      restartInterval = if (id % 4 == 0) 2 else 0)
  }

  /** [[jpegSynth]]'s progressive sibling: the same exact-integer-DCT
    * planes emitted as a SOF2 multi-scan stream (spectral bands + one
    * successive-approximation level, restarts on every 4th id) — decodes
    * to the identical pixels, so the two share one closed-form oracle. */
  def jpegSynthProgressive(id: Long, w: Int, h: Int): Array[Byte] = {
    val pw = ceilDiv(w, 8) * 8
    val ph = ceilDiv(h, 8) * 8
    val (yP, cbP, crP) = jpegSynthPlanes(id, pw, ph)
    encodeProgressive(w, h, Seq(yP, cbP, crP), Seq((1, 1), (1, 1), (1, 1)),
      QuantUnit, QuantUnit, al = 1,
      restartInterval = if (id % 4 == 0) 2 else 0,
      // static tables: per-scan optimal table builds dominate on tiny
      // images; decoded pixels are identical either way
      optimalTables = false)
  }

  /** General RGB 4:4:4 encode at a quality setting: RGB->YCbCr with the
    * JFIF constants (floor(x+0.5), clamp), edge-replication padding,
    * Annex K tables scaled by `quality`. */
  def encodeRgb444(w: Int, h: Int, rgb: Array[Byte], quality: Int = 90)
      : Array[Byte] = {
    require(rgb.length == w * h * 3, "RGB length mismatch")
    val pw = ceilDiv(w, 8) * 8
    val ph = ceilDiv(h, 8) * 8
    val yP = new Array[Int](pw * ph)
    val cbP = new Array[Int](pw * ph)
    val crP = new Array[Int](pw * ph)
    var y = 0
    while (y < ph) {
      var x = 0
      while (x < pw) {
        val sxp = math.min(x, w - 1); val syp = math.min(y, h - 1)
        val o = (syp * w + sxp) * 3
        val r = rgb(o) & 0xff; val g = rgb(o + 1) & 0xff
        val b = rgb(o + 2) & 0xff
        yP(y * pw + x) = clamp255(math.floor(
          0.299 * r + 0.587 * g + 0.114 * b + 0.5).toInt)
        cbP(y * pw + x) = clamp255(math.floor(
          128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5).toInt)
        crP(y * pw + x) = clamp255(math.floor(
          128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5).toInt)
        x += 1
      }
      y += 1
    }
    encodeBaseline(w, h,
      Seq(EncPlane(pw, ph, yP), EncPlane(pw, ph, cbP), EncPlane(pw, ph, crP)),
      Seq((1, 1), (1, 1), (1, 1)),
      scaledQuant(StdQuantLuma, quality), scaledQuant(StdQuantChroma, quality))
  }

  // ---------------------------------------------- progressive (SOF2)

  /** Full progressive JPEG decode (ITU-T T.81 Annex G, Huffman): spectral
    * selection AND successive approximation, DC first/refinement scans
    * (interleaved or single-component), non-interleaved AC first scans
    * with EOB-run coding, AC refinement scans with correction bits,
    * DRI/RSTn inside any scan, DHT/DQT redefinition between scans.
    *
    * Coefficients accumulate per component over the MCU-padded block
    * grid; AC scans cover the component's non-interleaved grid (T.81
    * A.2.2 — the padded remainder blocks carry DC only, and no visible
    * pixel samples them). After EOI: dequantize + IDCT + the same
    * upsample/color path the sequential decoder uses.
    *
    * Same 8-bit / 1-or-3-component / sampling-1-2 scope as
    * [[decodeBaseline]]; throws IllegalArgumentException on malformed or
    * out-of-scope input. */
  def decodeProgressive(p: Array[Byte]): JpegImage = {
    require(p != null && p.length >= 4 &&
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8, "not a JPEG")
    var pos = 2
    def be16(o: Int): Int = {
      require(o + 2 <= p.length, "truncated segment")
      ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
    }
    val quant = new Array[Array[Int]](4)
    val dcTab = new Array[HuffTable](4)
    val acTab = new Array[HuffTable](4)
    var width = 0; var height = 0
    var compId: Array[Int] = null
    var compSh: Array[Int] = null
    var compSv: Array[Int] = null
    var compQ: Array[Int] = null
    var restartInterval = 0
    var sawSof = false
    var sawScan = false
    var mcusX = 0; var mcusY = 0; var hMax = 0; var vMax = 0
    var bW: Array[Int] = null; var bH: Array[Int] = null // padded block grid
    var nW: Array[Int] = null; var nH: Array[Int] = null // non-interleaved
    var coefs: Array[Array[Int]] = null // (by*bW+bx)*64 + natural index

    /** Decode one scan\'s entropy data; returns the byte position just
      * past it. */
    def runScan(start: Int, scanComp: Array[Int], scanDc: Array[Int],
                scanAc: Array[Int], ss: Int, se: Int, ah: Int,
                al: Int): Int = {
      val br = new BitReader(p, start)
      var eobrun = 0
      val pred = new Array[Int](compId.length)
      var rstIdx = 0
      def maybeRestart(unit: Int): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          br.restart(rstIdx % 8); rstIdx += 1
          java.util.Arrays.fill(pred, 0); eobrun = 0
        }
      if (ss == 0) {
        require(se == 0, "DC scan must have Se = 0")
        def dcUnit(c: Int, s: Int, base: Int): Unit =
          if (ah == 0) {
            val t = dcTab(scanDc(s))
            require(t != null, "missing DC table")
            val dsz = t.decode(br)
            require(dsz <= 11, "bad DC size")
            pred(c) += extend(br.receive(dsz), dsz)
            coefs(c)(base) = pred(c) << al
          } else if (br.nextBit() == 1) coefs(c)(base) |= 1 << al
        if (scanComp.length > 1) {
          // interleaved: the frame\'s MCU grid, sh x sv blocks per comp
          var mcu = 0
          val nM = mcusX * mcusY
          while (mcu < nM) {
            maybeRestart(mcu)
            val mx = mcu % mcusX; val my = mcu / mcusX
            var s = 0
            while (s < scanComp.length) {
              val c = scanComp(s)
              var bv = 0
              while (bv < compSv(c)) {
                var bh = 0
                while (bh < compSh(c)) {
                  dcUnit(c, s,
                    ((my * compSv(c) + bv) * bW(c) + mx * compSh(c) + bh) * 64)
                  bh += 1
                }
                bv += 1
              }
              s += 1
            }
            mcu += 1
          }
        } else {
          val c = scanComp(0)
          var b = 0
          val total = nW(c) * nH(c)
          while (b < total) {
            maybeRestart(b)
            dcUnit(c, 0, ((b / nW(c)) * bW(c) + b % nW(c)) * 64)
            b += 1
          }
        }
      } else {
        // AC scan: never interleaved (T.81 G.1.1.1.1)
        require(scanComp.length == 1, "AC scans must be single-component")
        require(ss <= se && se <= 63, "bad spectral selection")
        val c = scanComp(0)
        val act = acTab(scanAc(0))
        require(act != null, "missing AC table")
        val co = coefs(c)
        def acFirst(base: Int): Unit =
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            while (k <= se) {
              val rs = act.decode(br)
              val r = rs >> 4; val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << r) - 1
                  if (r > 0) eobrun += br.receive(r)
                  k = se + 1 // EOB covers the rest of this block
                }
              } else {
                k += r
                require(k <= se, "AC run overflows band")
                co(base + Zigzag(k)) = extend(br.receive(s), s) << al
                k += 1
              }
            }
          }
        def acRefine(base: Int): Unit = {
          val p1 = 1 << al
          var k = ss
          if (eobrun == 0) {
            var atEob = false
            while (k <= se && !atEob) {
              val rs = act.decode(br)
              var r = rs >> 4; val s = rs & 15
              var newval = 0
              if (s == 0) {
                if (r != 15) { // EOBn: run includes this block
                  eobrun = 1 << r
                  if (r > 0) eobrun += br.receive(r)
                  atEob = true
                } // r == 15 (ZRL): pass 16 zero-history coefficients
              } else {
                require(s == 1, "bad refinement magnitude")
                newval = if (br.nextBit() == 1) p1 else -p1
              }
              if (!atEob) {
                // advance past r zero-history coefficients, emitting a
                // correction bit at every nonzero-history one passed
                var placed = false
                while (k <= se && !placed) {
                  val z = base + Zigzag(k)
                  if (co(z) != 0) {
                    if (br.nextBit() == 1 && (co(z) & p1) == 0)
                      co(z) += (if (co(z) >= 0) p1 else -p1)
                  } else if (r == 0) {
                    if (newval != 0) co(z) = newval
                    placed = true
                  } else r -= 1
                  k += 1
                }
              }
            }
          }
          if (eobrun > 0) {
            // EOB region: correction bits only, for the rest of the band
            while (k <= se) {
              val z = base + Zigzag(k)
              if (co(z) != 0 && br.nextBit() == 1 && (co(z) & p1) == 0)
                co(z) += (if (co(z) >= 0) p1 else -p1)
              k += 1
            }
            eobrun -= 1
          }
        }
        var b = 0
        val total = nW(c) * nH(c)
        while (b < total) {
          maybeRestart(b)
          val base = ((b / nW(c)) * bW(c) + b % nW(c)) * 64
          if (ah == 0) acFirst(base) else acRefine(base)
          b += 1
        }
      }
      br.bytePos
    }

    var done = false
    while (!done) {
      require(pos + 2 <= p.length, "truncated stream")
      require((p(pos) & 0xff) == 0xff, "lost marker sync")
      while (pos + 1 < p.length && (p(pos + 1) & 0xff) == 0xff)
        pos += 1 // fill bytes
      val m = p(pos + 1) & 0xff
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2
      else if (m == 0xd9) done = true
      else {
        val len = be16(pos + 2)
        require(len >= 2 && pos + 2 + len <= p.length, "bad segment length")
        val seg = pos + 4
        val segLen = len - 2
        var nextPos = pos + 2 + len
        m match {
          case 0xc2 => // progressive DCT, Huffman
            require(!sawSof, "multiple SOF")
            require(segLen >= 6, "short SOF")
            require((p(seg) & 0xff) == 8, "only 8-bit precision supported")
            height = be16(seg + 1); width = be16(seg + 3)
            val nc = p(seg + 5) & 0xff
            require(nc == 1 || nc == 3, "1 or 3 components supported")
            require(segLen >= 6 + 3 * nc, "short SOF component list")
            require(width > 0 && height > 0, "bad dimensions")
            require(width.toLong * height <= 64L * 1024 * 1024,
              "image too large")
            compId = new Array[Int](nc); compSh = new Array[Int](nc)
            compSv = new Array[Int](nc); compQ = new Array[Int](nc)
            var c = 0
            while (c < nc) {
              compId(c) = p(seg + 6 + 3 * c) & 0xff
              val sf = p(seg + 7 + 3 * c) & 0xff
              compSh(c) = sf >> 4; compSv(c) = sf & 0x0f
              require(compSh(c) >= 1 && compSh(c) <= 2 &&
                compSv(c) >= 1 && compSv(c) <= 2,
                "sampling factors 1-2 supported")
              compQ(c) = p(seg + 8 + 3 * c) & 0xff
              require(compQ(c) < 4, "bad quant table id")
              c += 1
            }
            hMax = compSh.max; vMax = compSv.max
            mcusX = ceilDiv(width, 8 * hMax)
            mcusY = ceilDiv(height, 8 * vMax)
            bW = Array.tabulate(nc)(c => mcusX * compSh(c))
            bH = Array.tabulate(nc)(c => mcusY * compSv(c))
            nW = Array.tabulate(nc)(c =>
              ceilDiv(ceilDiv(width * compSh(c), hMax), 8))
            nH = Array.tabulate(nc)(c =>
              ceilDiv(ceilDiv(height * compSv(c), vMax), 8))
            coefs = Array.tabulate(nc)(c => new Array[Int](bW(c) * bH(c) * 64))
            sawSof = true
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
               0xcb | 0xcd | 0xce | 0xcf =>
            throw new IllegalArgumentException(
              f"decodeProgressive expects SOF2, found 0xFF$m%02x")
          case 0xc4 => // DHT — may be redefined between scans
            var o = seg
            while (o < seg + segLen) {
              require(o + 17 <= seg + segLen, "short DHT")
              val tc = (p(o) & 0xff) >> 4
              val th = p(o) & 0x0f
              require(tc <= 1 && th < 4, "bad DHT header")
              val bits = Array.tabulate(16)(i => p(o + 1 + i) & 0xff)
              val n = bits.sum
              require(n <= 256 && o + 17 + n <= seg + segLen, "bad DHT count")
              val huffval = Array.tabulate(n)(i => p(o + 17 + i) & 0xff)
              val tab = new HuffTable(bits, huffval)
              if (tc == 0) dcTab(th) = tab else acTab(th) = tab
              o += 17 + n
            }
          case 0xdb => // DQT
            var o = seg
            while (o < seg + segLen) {
              val pq = (p(o) & 0xff) >> 4
              val tq = p(o) & 0x0f
              require(pq <= 1 && tq < 4, "bad DQT header")
              val n = if (pq == 0) 64 else 128
              require(o + 1 + n <= seg + segLen, "short DQT")
              val q = new Array[Int](64)
              var k = 0
              while (k < 64) {
                q(Zigzag(k)) =
                  if (pq == 0) p(o + 1 + k) & 0xff
                  else ((p(o + 1 + 2 * k) & 0xff) << 8) |
                    (p(o + 2 + 2 * k) & 0xff)
                k += 1
              }
              quant(tq) = q
              o += 1 + n
            }
          case 0xdd =>
            require(segLen >= 2, "short DRI")
            restartInterval = be16(seg)
          case 0xda => // SOS: one of the progression\'s scans
            require(sawSof, "SOS before SOF")
            val ns = p(seg) & 0xff
            require(ns >= 1 && ns <= compId.length, "bad scan components")
            require(segLen >= 4 + 2 * ns, "short SOS")
            val scanComp = new Array[Int](ns)
            val scanDc = new Array[Int](ns)
            val scanAc = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val id = p(seg + 1 + 2 * c) & 0xff
              val idx = compId.indexOf(id)
              require(idx >= 0, "SOS names unknown component")
              scanComp(c) = idx
              val tt = p(seg + 2 + 2 * c) & 0xff
              scanDc(c) = tt >> 4; scanAc(c) = tt & 0x0f
              c += 1
            }
            val ss = p(seg + 1 + 2 * ns) & 0xff
            val se = p(seg + 2 + 2 * ns) & 0xff
            val aa = p(seg + 3 + 2 * ns) & 0xff
            nextPos = runScan(pos + 2 + len, scanComp, scanDc, scanAc,
              ss, se, aa >> 4, aa & 0x0f)
            sawScan = true
          case _ => () // APPn / COM / DNL skipped
        }
        pos = nextPos
      }
    }
    require(sawSof && sawScan, "no SOF2 frame or no scan before EOI")

    // dequantize + IDCT every padded block into component planes
    val nc = compId.length
    val planeW = Array.tabulate(nc)(c => bW(c) * 8)
    val planes = Array.tabulate(nc)(c => new Array[Int](planeW(c) * bH(c) * 8))
    val block = new Array[Int](64)
    var c = 0
    while (c < nc) {
      val q = quant(compQ(c))
      require(q != null, "missing quant table")
      val co = coefs(c)
      var by = 0
      while (by < bH(c)) {
        var bx = 0
        while (bx < bW(c)) {
          val base = (by * bW(c) + bx) * 64
          var i = 0
          while (i < 64) { block(i) = co(base + i) * q(i); i += 1 }
          val s = idctBlock(block)
          val ox = bx * 8; val oy = by * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              planes(c)((oy + y) * planeW(c) + ox + x) =
                clamp255(math.floor(s(y * 8 + x) + 128.0 + 0.5).toInt)
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    planesToRgb(width, height, planes, planeW, compSh, compSv, hMax, vMax)
  }

  /** Scan the marker stream for the frame type and dispatch: SOF0/SOF1 ->
    * [[decodeBaseline]], SOF2 -> [[decodeProgressive]]. This is the entry
    * real corpora should use — web crawls carry progressive JPEGs at
    * double-digit percentages. */
  def decode(p: Array[Byte]): JpegImage = {
    require(p != null && p.length >= 4 &&
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8, "not a JPEG")
    var pos = 2
    while (pos + 4 <= p.length) {
      require((p(pos) & 0xff) == 0xff, "lost marker sync")
      while (pos + 1 < p.length && (p(pos + 1) & 0xff) == 0xff) pos += 1
      val m = p(pos + 1) & 0xff
      if (m == 0xc0 || m == 0xc1) return decodeBaseline(p)
      if (m == 0xc2) return decodeProgressive(p)
      if ((m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8) || m == 0xd9)
        throw new IllegalArgumentException(
          f"unsupported frame type before SOF, marker 0xFF$m%02x")
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2
      else {
        val len = ((p(pos + 2) & 0xff) << 8) | (p(pos + 3) & 0xff)
        require(len >= 2 && pos + 2 + len <= p.length, "bad segment length")
        pos += 2 + len
      }
    }
    throw new IllegalArgumentException("no SOF marker found")
  }

  /** AC successive-approximation point transform: T.81 G.1.2.1 divides
    * magnitudes, so truncation is toward zero (an arithmetic shift would
    * floor negatives one too far). DC uses the arithmetic shift. */
  private def ptAc(v: Int, al: Int): Int =
    if (v >= 0) v >> al else -((-v) >> al)

  /** Static progressive Huffman tables for `optimalTables = false`: DC
    * covers sizes 0..11; AC covers ALL 256 symbols (every (run, size)
    * pair, every EOBn run bucket, ZRL) under a plausible frequency prior
    * — any progressive symbol stream encodes against them. Built once
    * through the validated [[buildHuffman]] length-limited procedure. */
  private lazy val staticDcTable: (Array[Int], Array[Int]) =
    buildHuffman(Array.tabulate(256)(i => if (i <= 11) 1 << (12 - i) else 0))
  private lazy val staticAcProgTable: (Array[Int], Array[Int]) =
    buildHuffman(Array.tabulate(256) { i =>
      val r = i >> 4; val sz = i & 15
      if (sz == 0) math.max(1, 4096 >> (2 * math.min(r, 6)))
      else math.max(1, 8192 >> (r + 2 * sz))
    })
  private lazy val staticDcCodes: Array[(Int, Int)] =
    assignCodes(staticDcTable._1, staticDcTable._2)
  private lazy val staticAcProgCodes: Array[(Int, Int)] =
    assignCodes(staticAcProgTable._1, staticAcProgTable._2)

  /** Progressive (SOF2) encoder: spectral selection + successive
    * approximation, the scan script web encoders commonly emit — DC
    * first (interleaved, point transform `al`), DC refinement bits down
    * to 0, then per component AC bands 1..5 and 6..63 first at `al`
    * followed by refinement passes down to 0. Optional DRI/RSTn.
    * Exists so the decoder can be specced against real multi-scan
    * streams without external fixtures; the coefficient math is shared
    * with [[encodeBaseline]], so decode(encodeProgressive(x)) must equal
    * decode(encodeBaseline(x)) pixel-for-pixel.
    *
    * @param optimalTables true (default): per-scan optimal Huffman
    *        tables, table id 0 redefined before every scan — exercises
    *        the decoder's between-scan DHT handling. false: the static
    *        all-symbol tables above, emitted ONCE before the first scan
    *        (T.81 tables persist across scans) — skips the per-scan
    *        frequency pass and table build, the dominant cost when
    *        encoding many small images (the corpus-synthesis path). */
  def encodeProgressive(width: Int, height: Int, planes: Seq[EncPlane],
                        sampling: Seq[(Int, Int)],
                        quantLuma: Array[Int] = QuantUnit,
                        quantChroma: Array[Int] = QuantUnit,
                        al: Int = 1,
                        restartInterval: Int = 0,
                        optimalTables: Boolean = true): Array[Byte] = {
    val nc = planes.length
    require(nc == 1 || nc == 3, "1 or 3 components")
    require(sampling.length == nc, "one sampling factor pair per plane")
    require(width > 0 && height > 0, "positive dimensions")
    require(al >= 0 && al <= 10, "al in 0..10")
    sampling.foreach { case (h, v) =>
      require(h >= 1 && h <= 2 && v >= 1 && v <= 2, "sampling factors 1-2")
    }
    val hMax = sampling.map(_._1).max
    val vMax = sampling.map(_._2).max
    val mcusX = ceilDiv(width, 8 * hMax)
    val mcusY = ceilDiv(height, 8 * vMax)
    planes.zip(sampling).foreach { case (pl, (sh, sv)) =>
      require(pl.w == mcusX * 8 * sh && pl.h == mcusY * 8 * sv,
        s"plane must be padded to ${mcusX * 8 * sh}x${mcusY * 8 * sv}, " +
          s"got ${pl.w}x${pl.h}")
      require(pl.data.length == pl.w * pl.h, "plane data length mismatch")
    }
    val quantOf = (c: Int) => if (c == 0) quantLuma else quantChroma
    val bW = Array.tabulate(nc)(c => mcusX * sampling(c)._1)
    val bH = Array.tabulate(nc)(c => mcusY * sampling(c)._2)
    val nW = Array.tabulate(nc)(c =>
      ceilDiv(ceilDiv(width * sampling(c)._1, hMax), 8))
    val nH = Array.tabulate(nc)(c =>
      ceilDiv(ceilDiv(height * sampling(c)._2, vMax), 8))

    // quantized coefficients per component over the padded block grid
    val co = Array.tabulate(nc) { c =>
      val (pl, q) = (planes(c), quantOf(c))
      val out = new Array[Int](bW(c) * bH(c) * 64)
      val s = new Array[Double](64)
      var by = 0
      while (by < bH(c)) {
        var bx = 0
        while (bx < bW(c)) {
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              s(y * 8 + x) = pl.data((by * 8 + y) * pl.w + bx * 8 + x) - 128.0
              x += 1
            }
            y += 1
          }
          val f = fdctBlock(s)
          val base = (by * bW(c) + bx) * 64
          var i = 0
          while (i < 64) {
            out(base + i) = math.round(f(i) / q(i)).toInt
            i += 1
          }
          bx += 1
        }
        by += 1
      }
      out
    }

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    val nTbl = if (nc == 1) 1 else 2
    marker(0xdb); u16(2 + nTbl * 65) // DQT
    var t = 0
    while (t < nTbl) {
      u8(t)
      val q = if (t == 0) quantLuma else quantChroma
      var k = 0
      while (k < 64) { u8(q(Zigzag(k))); k += 1 }
      t += 1
    }
    marker(0xc2); u16(8 + 3 * nc); u8(8); u16(height); u16(width); u8(nc)
    var c0 = 0
    while (c0 < nc) {
      u8(c0 + 1); u8((sampling(c0)._1 << 4) | sampling(c0)._2)
      u8(if (c0 == 0) 0 else 1)
      c0 += 1
    }
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }

    /** Two-pass scan emission: the generator calls the sink once to count
      * symbol frequencies and once to write codes — identical control
      * flow both times, so the stream always matches its own table. */
    trait Sink {
      def sym(s: Int): Unit
      def bits(v: Int, n: Int): Unit
      def restartMark(): Unit
    }
    final class FreqSink extends Sink {
      val freq = new Array[Int](256)
      def sym(s: Int): Unit = freq(s) += 1
      def bits(v: Int, n: Int): Unit = ()
      def restartMark(): Unit = ()
    }
    final class WriteSink(codes: Array[(Int, Int)]) extends Sink {
      val bw = new BitWriter(out)
      private var rstIdx = 0
      def sym(s: Int): Unit = {
        val (code, len) = codes(s)
        require(len > 0, s"symbol $s has no code")
        bw.put(code, len)
      }
      def bits(v: Int, n: Int): Unit = if (n > 0) bw.put(v, n)
      def restartMark(): Unit = {
        bw.flush()
        marker(0xd0 + rstIdx % 8)
        rstIdx += 1
      }
    }
    def emitDht(clazz: Int, tab: (Array[Int], Array[Int])): Unit = {
      val (bits, huffval) = tab
      marker(0xc4); u16(2 + 1 + 16 + huffval.length)
      u8((clazz << 4) | 0)
      bits.foreach(u8); huffval.foreach(u8)
    }
    if (!optimalTables) { // static tables persist across all scans
      emitDht(0, staticDcTable); emitDht(1, staticAcProgTable)
    }
    /** Emit DHT (class/id 0, optimal mode only) + SOS + entropy for one
      * scan. `gen` drives a sink; `tblClass` < 0 means the scan uses no
      * Huffman table (DC refinement). */
    def scan(comps: Seq[Int], ss: Int, se: Int, ah: Int, sal: Int,
             tblClass: Int)(gen: Sink => Unit): Unit = {
      var codes: Array[(Int, Int)] = null
      if (tblClass >= 0) {
        if (optimalTables) {
          val fs = new FreqSink
          gen(fs)
          val tab = buildHuffman(fs.freq)
          emitDht(tblClass, tab)
          codes = assignCodes(tab._1, tab._2)
        } else codes =
          if (tblClass == 0) staticDcCodes else staticAcProgCodes
      }
      marker(0xda); u16(6 + 2 * comps.length); u8(comps.length)
      comps.foreach { c => u8(c + 1); u8(0) } // Td = Ta = 0
      u8(ss); u8(se); u8((ah << 4) | sal)
      val ws = new WriteSink(
        if (codes != null) codes else Array.fill(256)((0, 0)))
      gen(ws)
      ws.bw.flush()
    }

    // ---- DC scans: interleaved over the frame MCU grid
    def dcScan(sal: Int, refine: Boolean): Unit =
      scan(0 until nc, 0, 0, if (refine) sal + 1 else 0, sal,
          if (refine) -1 else 0) { sink =>
        val pred = new Array[Int](nc)
        var mcu = 0
        val nM = mcusX * mcusY
        while (mcu < nM) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            sink.restartMark()
            java.util.Arrays.fill(pred, 0)
          }
          val mx = mcu % mcusX; val my = mcu / mcusX
          var c = 0
          while (c < nc) {
            val (sh, sv) = sampling(c)
            var bv = 0
            while (bv < sv) {
              var bh = 0
              while (bh < sh) {
                val qc0 = co(c)(((my * sv + bv) * bW(c) + mx * sh + bh) * 64)
                if (!refine) {
                  val v = qc0 >> sal // DC point transform: arithmetic shift
                  val diff = v - pred(c)
                  pred(c) = v
                  val dsz = if (diff == 0) 0 else bitSize(math.abs(diff))
                  sink.sym(dsz)
                  if (dsz > 0)
                    sink.bits(
                      if (diff < 0) diff + (1 << dsz) - 1 else diff, dsz)
                } else sink.bits((qc0 >> sal) & 1, 1)
                bh += 1
              }
              bv += 1
            }
            c += 1
          }
          mcu += 1
        }
      }

    // ---- AC first scan (Ah = 0) for one component band
    def acFirstScan(c: Int, ss: Int, se: Int, sal: Int): Unit =
      scan(Seq(c), ss, se, 0, sal, 1) { sink =>
        var eobrun = 0
        def flushEob(): Unit = if (eobrun > 0) {
          val r = bitSize(eobrun) - 1
          sink.sym(r << 4)
          if (r > 0) sink.bits(eobrun - (1 << r), r)
          eobrun = 0
        }
        val cc = co(c)
        var b = 0
        val total = nW(c) * nH(c)
        while (b < total) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
            flushEob(); sink.restartMark()
          }
          val base = ((b / nW(c)) * bW(c) + b % nW(c)) * 64
          var r = 0
          var k = ss
          while (k <= se) {
            val v = ptAc(cc(base + Zigzag(k)), sal)
            if (v == 0) r += 1
            else {
              flushEob()
              while (r > 15) { sink.sym(0xf0); r -= 16 }
              val sz = bitSize(math.abs(v))
              sink.sym((r << 4) | sz)
              sink.bits(if (v < 0) v + (1 << sz) - 1 else v, sz)
              r = 0
            }
            k += 1
          }
          if (r > 0) { // trailing zeros -> this block joins the EOB run
            eobrun += 1
            if (eobrun == 0x7fff) flushEob()
          }
          b += 1
        }
        flushEob()
      }

    // ---- AC refinement scan (Ah = sal + 1, Al = sal): mirrors the
    // decoder's advance loop so correction bits land positionally
    def acRefineScan(c: Int, ss: Int, se: Int, sal: Int): Unit =
      scan(Seq(c), ss, se, sal + 1, sal, 1) { sink =>
        var eobrun = 0
        val brEob = new scala.collection.mutable.ArrayBuffer[Int]()
        def flushEob(): Unit = if (eobrun > 0) {
          val r = bitSize(eobrun) - 1
          sink.sym(r << 4)
          if (r > 0) sink.bits(eobrun - (1 << r), r)
          brEob.foreach(bit => sink.bits(bit, 1))
          brEob.clear()
          eobrun = 0
        }
        val cc = co(c)
        var b = 0
        val total = nW(c) * nH(c)
        while (b < total) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
            flushEob(); sink.restartMark()
          }
          val base = ((b / nW(c)) * bW(c) + b % nW(c)) * 64
          def qv(k: Int): Int = cc(base + Zigzag(k))
          def hist(k: Int): Boolean = ptAc(qv(k), sal + 1) != 0
          def newSig(k: Int): Boolean = !hist(k) && ptAc(qv(k), sal) != 0
          def corrBit(k: Int): Int = (math.abs(qv(k)) >> sal) & 1
          // last newly-significant position; -1 if none (all-EOB block)
          var keob = -1
          var j = ss
          while (j <= se) { if (newSig(j)) keob = j; j += 1 }
          var k = ss
          while (k <= se && keob >= 0 && k <= keob) {
            // next newly-significant coefficient and the zero-history
            // run length before it
            var kn = k
            var r = 0
            while (!newSig(kn)) { if (!hist(kn)) r += 1; kn += 1 }
            flushEob()
            while (r > 15) {
              sink.sym(0xf0) // ZRL: decoder passes 16 zero-history coefs
              var cnt = 0
              while (cnt < 16) {
                if (hist(k)) sink.bits(corrBit(k), 1) else cnt += 1
                k += 1
              }
              r -= 16
            }
            sink.sym((r << 4) | 1)
            sink.bits(if (qv(kn) > 0) 1 else 0, 1)
            while (k < kn) { // corrections passed on the way to kn
              if (hist(k)) sink.bits(corrBit(k), 1)
              k += 1
            }
            k = kn + 1
          }
          if (keob < se) { // trailing region joins the EOB run
            var j2 = math.max(k, ss)
            while (j2 <= se) { if (hist(j2)) brEob += corrBit(j2); j2 += 1 }
            eobrun += 1
            if (eobrun == 0x7fff) flushEob()
          }
          b += 1
        }
        flushEob()
      }

    // ---- the progression script
    dcScan(al, refine = false)
    var a = al - 1
    while (a >= 0) { dcScan(a, refine = true); a -= 1 }
    var c = 0
    while (c < nc) {
      for ((bs, be) <- Seq((1, 5), (6, 63))) {
        acFirstScan(c, bs, be, al)
        var aa = al - 1
        while (aa >= 0) { acRefineScan(c, bs, be, aa); aa -= 1 }
      }
      c += 1
    }
    marker(0xd9) // EOI
    out.toByteArray
  }
}
