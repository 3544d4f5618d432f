package graft.operators

import graft.SparkTestBase

/** Baseline JPEG codec verification, in three independence tiers:
  *  1. bit-exact roundtrips on exact-DCT-span patterns (unit quant) —
  *     expected pixels computed from the closed-form synthesis formula,
  *     the same closed form the DuckDB oracle replays;
  *  2. lossy-path agreement against a REFERENCE reconstruction whose
  *     DCT/IDCT are naive direct-formula double loops written here
  *     (independent of the codec's separable kernels);
  *  3. structural checks: Huffman table validity, zigzag permutation,
  *     restart-marker invariance, malformed-input rejection.
  */
class JpegSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------- helpers

  /** Closed-form expected RGB at (x, y) for jpegSynth(id) — mirrors
    * Jpeg.jpegSynthPlanes + the decoder's color convert, and is the
    * exact formula the DuckDB oracle runs. */
  private def expectedRgb(id: Long, x: Int, y: Int): (Int, Int, Int) = {
    val idi = (id % 1000).toInt
    val bx = x / 8; val by = y / 8
    val sx = Jpeg.s4(x); val sy = Jpeg.s4(y)
    val yv = 40 + (bx * 29 + by * 17 + idi * 3) % 176 +
      ((bx + by + idi) % 7 - 3) * sx +
      ((2 * bx + by + idi) % 5 - 2) * sy +
      ((bx + 2 * by + idi) % 3 - 1) * sx * sy
    val cb = 70 + (13 * bx + 7 * by + 5 * idi) % 116 +
      ((bx + idi) % 3 - 1) * sx + ((by + idi) % 3 - 1) * sy
    val cr = 70 + (11 * bx + 19 * by + 7 * idi) % 116 +
      ((by + idi) % 3 - 1) * sx + ((bx + 2 * idi) % 3 - 1) * sy
    def cl(v: Int) = math.max(0, math.min(255, v))
    (cl(math.floor(yv + 1.402 * (cr - 128) + 0.5).toInt),
      cl(math.floor(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)
        .toInt),
      cl(math.floor(yv + 1.772 * (cb - 128) + 0.5).toInt))
  }

  /** Naive direct-formula 8x8 DCT — independent of Jpeg's separable
    * kernel (no shared code, no shared cosine table). */
  private def naiveFdct(s: Array[Double]): Array[Double] = {
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    Array.tabulate(64) { i =>
      val v = i / 8; val u = i % 8
      var acc = 0.0
      for (yy <- 0 until 8; xx <- 0 until 8)
        acc += s(yy * 8 + xx) *
          math.cos((2 * xx + 1) * u * math.Pi / 16.0) *
          math.cos((2 * yy + 1) * v * math.Pi / 16.0)
      0.25 * c(u) * c(v) * acc
    }
  }

  private def naiveIdct(f: Array[Int]): Array[Double] = {
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    Array.tabulate(64) { i =>
      val yy = i / 8; val xx = i % 8
      var acc = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        acc += c(u) * c(v) * f(v * 8 + u) *
          math.cos((2 * xx + 1) * u * math.Pi / 16.0) *
          math.cos((2 * yy + 1) * v * math.Pi / 16.0)
      0.25 * acc
    }
  }

  /** Reference reconstruction of a single padded plane through
    * quantization: naive FDCT -> round/quant -> dequant -> naive IDCT ->
    * floor(x+128.5) clamp. The decoder must agree within +-1 per sample
    * (double-rounding boundary slack between naive and separable). */
  private def referencePlane(plane: Jpeg.EncPlane, q: Array[Int])
      : Array[Int] = {
    val out = new Array[Int](plane.w * plane.h)
    for (by <- 0 until plane.h / 8; bx <- 0 until plane.w / 8) {
      val s = Array.tabulate(64) { i =>
        plane.data((by * 8 + i / 8) * plane.w + bx * 8 + i % 8) - 128.0
      }
      val f = naiveFdct(s)
      val deq = Array.tabulate(64)(i => math.round(f(i) / q(i)).toInt * q(i))
      val r = naiveIdct(deq)
      for (i <- 0 until 64)
        out((by * 8 + i / 8) * plane.w + bx * 8 + i % 8) =
          math.max(0, math.min(255, math.floor(r(i) + 128.0 + 0.5).toInt))
    }
    out
  }

  // ------------------------------------------------- tier 1: bit-exact

  test("jpegSynth roundtrips bit-exactly against the closed form") {
    for (id <- Seq(0L, 1L, 2L, 3L, 5L, 17L, 123L, 999L, 1000L, 123456L)) {
      val w = (id % 9 + 4).toInt
      val h = (id % 7 + 4).toInt
      val img = Jpeg.decodeBaseline(Jpeg.jpegSynth(id, w, h))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val got = (img.rgb(o) & 0xff, img.rgb(o + 1) & 0xff,
          img.rgb(o + 2) & 0xff)
        assert(got == expectedRgb(id, x, y),
          s"id=$id pixel ($x,$y): got $got, want ${expectedRgb(id, x, y)}")
      }
    }
  }

  test("4:2:0 subsampled stream roundtrips bit-exactly on exact-span planes") {
    val w = 21; val h = 13 // not multiples of 16: partial MCUs both axes
    val mcusX = (w + 15) / 16; val mcusY = (h + 15) / 16
    val (yFull, _, _) = Jpeg.jpegSynthPlanes(7L, mcusX * 16, mcusY * 16)
    val (_, cbHalf, crHalf) = Jpeg.jpegSynthPlanes(11L, mcusX * 8, mcusY * 8)
    val bytes = Jpeg.encodeBaseline(w, h,
      Seq(yFull, cbHalf, crHalf), Seq((2, 2), (1, 1), (1, 1)))
    val img = Jpeg.decodeBaseline(bytes)
    assert(img.width == w && img.height == h)
    def cl(v: Int) = math.max(0, math.min(255, v))
    for (y <- 0 until h; x <- 0 until w) {
      val yv = yFull.data(y * yFull.w + x)
      val cb = cbHalf.data((y / 2) * cbHalf.w + x / 2)
      val cr = crHalf.data((y / 2) * crHalf.w + x / 2)
      val want = (cl(math.floor(yv + 1.402 * (cr - 128) + 0.5).toInt),
        cl(math.floor(
          yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5).toInt),
        cl(math.floor(yv + 1.772 * (cb - 128) + 0.5).toInt))
      val o = (y * w + x) * 3
      val got = (img.rgb(o) & 0xff, img.rgb(o + 1) & 0xff,
        img.rgb(o + 2) & 0xff)
      assert(got == want, s"pixel ($x,$y): got $got, want $want")
    }
  }

  test("4:2:2 subsampled stream roundtrips bit-exactly on exact-span planes") {
    // horizontal-only chroma subsampling: Y at full width, chroma at
    // half width, full height — MCU is 2 Y blocks + 1 Cb + 1 Cr
    val w = 19; val h = 10
    val mcusX = (w + 15) / 16; val mcusY = (h + 7) / 8
    val (yFull, _, _) = Jpeg.jpegSynthPlanes(13L, mcusX * 16, mcusY * 8)
    val (_, cbHalf, crHalf) = Jpeg.jpegSynthPlanes(29L, mcusX * 8, mcusY * 8)
    val img = Jpeg.decodeBaseline(Jpeg.encodeBaseline(w, h,
      Seq(yFull, cbHalf, crHalf), Seq((2, 1), (1, 1), (1, 1))))
    assert(img.width == w && img.height == h)
    def cl(v: Int) = math.max(0, math.min(255, v))
    for (y <- 0 until h; x <- 0 until w) {
      val yv = yFull.data(y * yFull.w + x)
      val cb = cbHalf.data(y * cbHalf.w + x / 2)
      val cr = crHalf.data(y * crHalf.w + x / 2)
      val want = (cl(math.floor(yv + 1.402 * (cr - 128) + 0.5).toInt),
        cl(math.floor(
          yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5).toInt),
        cl(math.floor(yv + 1.772 * (cb - 128) + 0.5).toInt))
      val o = (y * w + x) * 3
      val got = (img.rgb(o) & 0xff, img.rgb(o + 1) & 0xff,
        img.rgb(o + 2) & 0xff)
      assert(got == want, s"pixel ($x,$y): got $got, want $want")
    }
  }

  test("grayscale single-component stream roundtrips bit-exactly") {
    val w = 19; val h = 9
    val pw = (w + 7) / 8 * 8; val ph = (h + 7) / 8 * 8
    val (yP, _, _) = Jpeg.jpegSynthPlanes(42L, pw, ph)
    val img = Jpeg.decodeBaseline(
      Jpeg.encodeBaseline(w, h, Seq(yP), Seq((1, 1))))
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val v = yP.data(y * pw + x)
      assert((img.rgb(o) & 0xff) == v && (img.rgb(o + 1) & 0xff) == v &&
        (img.rgb(o + 2) & 0xff) == v, s"pixel ($x,$y)")
    }
  }

  test("restart markers do not change decoded output") {
    val w = 24; val h = 16
    val (yP, cbP, crP) = Jpeg.jpegSynthPlanes(3L, 24, 16)
    val samp = Seq((1, 1), (1, 1), (1, 1))
    val plain = Jpeg.decodeBaseline(
      Jpeg.encodeBaseline(w, h, Seq(yP, cbP, crP), samp))
    for (ri <- Seq(1, 2, 3, 5)) {
      val rst = Jpeg.decodeBaseline(Jpeg.encodeBaseline(w, h,
        Seq(yP, cbP, crP), samp, restartInterval = ri))
      assert(java.util.Arrays.equals(plain.rgb, rst.rgb),
        s"restartInterval=$ri changed pixels")
    }
  }

  // ---------------------------------------- tier 2: lossy path vs naive

  test("lossy decode agrees with the naive-DCT reference reconstruction") {
    val w = 24; val h = 16
    val rgb = Multimodal.rgbSynthPixels(w, h)
    for (quality <- Seq(50, 75, 90)) {
      val qL = Jpeg.scaledQuant(Jpeg.StdQuantLuma, quality)
      val qC = Jpeg.scaledQuant(Jpeg.StdQuantChroma, quality)
      // rebuild the encoder's YCbCr planes with the same JFIF formulas
      def cl(v: Int) = math.max(0, math.min(255, v))
      val yP = new Array[Int](w * h); val cbP = new Array[Int](w * h)
      val crP = new Array[Int](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val r = rgb(o) & 0xff; val g = rgb(o + 1) & 0xff
        val b = rgb(o + 2) & 0xff
        yP(y * w + x) = cl(math.floor(
          0.299 * r + 0.587 * g + 0.114 * b + 0.5).toInt)
        cbP(y * w + x) = cl(math.floor(
          128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5).toInt)
        crP(y * w + x) = cl(math.floor(
          128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5).toInt)
      }
      val refY = referencePlane(Jpeg.EncPlane(w, h, yP), qL)
      val refCb = referencePlane(Jpeg.EncPlane(w, h, cbP), qC)
      val refCr = referencePlane(Jpeg.EncPlane(w, h, crP), qC)
      val img = Jpeg.decodeBaseline(Jpeg.encodeRgb444(w, h, rgb, quality))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val yv = refY(y * w + x); val cb = refCb(y * w + x)
        val cr = refCr(y * w + x)
        val want = Seq(
          cl(math.floor(yv + 1.402 * (cr - 128) + 0.5).toInt),
          cl(math.floor(
            yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5).toInt),
          cl(math.floor(yv + 1.772 * (cb - 128) + 0.5).toInt))
        val o = (y * w + x) * 3
        for (ch <- 0 until 3)
          maxDiff = math.max(maxDiff,
            math.abs((img.rgb(o + ch) & 0xff) - want(ch)))
      }
      // naive vs separable double kernels may flip a floor/round boundary;
      // a flipped quantized coefficient moves a pixel by at most a few
      // levels. Anything structural (zigzag, Huffman, dequant) explodes
      // this bound.
      assert(maxDiff <= 4, s"quality=$quality maxDiff=$maxDiff")
    }
  }

  test("quality-90 decode stays close to the original image") {
    val w = 32; val h = 24
    val rgb = Multimodal.rgbSynthPixels(w, h)
    val img = Jpeg.decodeBaseline(Jpeg.encodeRgb444(w, h, rgb, quality = 90))
    var sumAbs = 0L; var maxAbs = 0
    for (i <- 0 until w * h * 3) {
      val d = math.abs((img.rgb(i) & 0xff) - (rgb(i) & 0xff))
      sumAbs += d; maxAbs = math.max(maxAbs, d)
    }
    // rgbSynthPixels wraps mod 256, so the image has hard edges: ringing
    // makes quality-90 error larger than on natural images. The bound
    // catches structural breakage (wrong zigzag/dequant scrambles to
    // mean >> 20), not codec noise.
    val mean = sumAbs.toDouble / (w * h * 3)
    assert(mean <= 8.0, s"mean abs error $mean")
    assert(maxAbs <= 80, s"max abs error $maxAbs")
  }

  // -------------------------------------------- tier 3: structure/guards

  test("zigzag is a diagonal-ordered permutation of 0..63") {
    val z = Jpeg.Zigzag
    assert(z.sorted.sameElements(0 until 64)) // permutation
    // visits anti-diagonals (r+c) in non-decreasing order, one at a time
    val diags = z.map(i => i / 8 + i % 8)
    for (k <- 1 until 64) {
      assert(diags(k) >= diags(k - 1), s"zigzag backtracks a diagonal at $k")
      assert(diags(k) - diags(k - 1) <= 1, s"zigzag skips a diagonal at $k")
    }
    assert(z(0) == 0 && z(1) == 1 && z(2) == 8 && z(3) == 16 && z(63) == 63)
  }

  test("buildHuffman yields Kraft-valid tables covering all used symbols") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      val freq = new Array[Int](256)
      val nSyms = 1 + rnd.nextInt(200)
      for (_ <- 0 until nSyms) freq(rnd.nextInt(256)) += 1 + rnd.nextInt(1000)
      val (bits, huffval) = Jpeg.buildHuffman(freq)
      assert(bits.length == 16)
      val used = (0 until 256).filter(freq(_) > 0)
      assert(huffval.sorted.sameElements(used.sorted),
        s"trial $trial: table must cover exactly the used symbols")
      assert(bits.sum == huffval.length)
      val kraft = bits.zipWithIndex.map { case (n, i) =>
        n.toDouble / (1L << (i + 1))
      }.sum
      assert(kraft <= 1.0 + 1e-12, s"trial $trial: kraft=$kraft")
    }
  }

  test("APPn and COM segments are skipped without disturbing the decode") {
    val plain = Jpeg.jpegSynth(3L, 10, 7)
    // splice a JFIF-ish APP0 and a COM right after SOI
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16,
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val comment = "hello".getBytes("US-ASCII")
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0,
      (2 + comment.length).toByte) ++ comment
    val spliced = plain.take(2) ++ app0 ++ com ++ plain.drop(2)
    val a = Jpeg.decodeBaseline(plain)
    val b = Jpeg.decodeBaseline(spliced)
    assert(a.width == b.width && a.height == b.height)
    assert(java.util.Arrays.equals(a.rgb, b.rgb))
  }

  test("fill bytes and trailing segments before EOI are tolerated") {
    val plain = Jpeg.jpegSynth(9L, 11, 6)
    val a = Jpeg.decodeBaseline(plain)
    // T.81 permits 0xFF fill bytes before any marker; real writers also
    // emit trailing COM/APPn segments between the scan and EOI
    val eoi = plain.length - 2
    assert((plain(eoi) & 0xff) == 0xff && (plain(eoi + 1) & 0xff) == 0xd9)
    val fill = Array.fill(5)(0xff.toByte)
    val comment = "trailer".getBytes("US-ASCII")
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0,
      (2 + comment.length).toByte) ++ comment
    for (spliced <- Seq(
        plain.take(eoi) ++ fill ++ plain.drop(eoi),          // fill before EOI
        plain.take(eoi) ++ com ++ plain.drop(eoi),           // trailing COM
        plain.take(eoi) ++ fill ++ com ++ fill ++ plain.drop(eoi))) {
      val b = Jpeg.decodeBaseline(spliced)
      assert(a.width == b.width && a.height == b.height)
      assert(java.util.Arrays.equals(a.rgb, b.rgb))
    }
    // but scan data with NO EOI anywhere must still throw
    intercept[IllegalArgumentException](
      Jpeg.decodeBaseline(plain.take(eoi)))
  }

  test("progressive decode equals sequential decode of the same planes") {
    // both encoders quantize the SAME coefficients, so the two decoders
    // must agree pixel-for-pixel on every sampling layout and dimension
    for (id <- Seq(0L, 3L, 17L, 123L); (w, h) <- Seq((9, 8), (21, 13), (32, 24))) {
      val mcusX = (w + 7) / 8; val mcusY = (h + 7) / 8
      val (yP, cbP, crP) = Jpeg.jpegSynthPlanes(id, mcusX * 8, mcusY * 8)
      val planes = Seq(yP, cbP, crP)
      val samp = Seq((1, 1), (1, 1), (1, 1))
      val seqBytes = Jpeg.encodeBaseline(w, h, planes, samp)
      val progBytes = Jpeg.encodeProgressive(w, h, planes, samp, al = 2)
      val a = Jpeg.decodeBaseline(seqBytes)
      val b = Jpeg.decodeProgressive(progBytes)
      assert(a.width == b.width && a.height == b.height, s"id=$id $w x $h")
      assert(java.util.Arrays.equals(a.rgb, b.rgb), s"id=$id $w x $h")
      // and the dispatching entry picks the right path for both
      assert(java.util.Arrays.equals(Jpeg.decode(progBytes).rgb, b.rgb))
      assert(java.util.Arrays.equals(Jpeg.decode(seqBytes).rgb, a.rgb))
      // the static-table fast path (tables emitted once, persisting
      // across scans) must decode to the same pixels as optimal tables
      val statBytes = Jpeg.encodeProgressive(w, h, planes, samp, al = 2,
        optimalTables = false)
      assert(java.util.Arrays.equals(
        Jpeg.decodeProgressive(statBytes).rgb, b.rgb), s"static id=$id")
    }
  }

  test("progressive decode handles 4:2:0 subsampling and restart markers") {
    val w = 21; val h = 13 // partial MCUs both axes, dummy padded blocks
    val mcusX = (w + 15) / 16; val mcusY = (h + 15) / 16
    val (yFull, _, _) = Jpeg.jpegSynthPlanes(7L, mcusX * 16, mcusY * 16)
    val (_, cbHalf, crHalf) = Jpeg.jpegSynthPlanes(11L, mcusX * 8, mcusY * 8)
    val planes = Seq(yFull, cbHalf, crHalf)
    val samp = Seq((2, 2), (1, 1), (1, 1))
    val seq420 = Jpeg.decodeBaseline(Jpeg.encodeBaseline(w, h, planes, samp))
    for (rst <- Seq(0, 1, 2); al <- Seq(0, 1, 2)) {
      val prog = Jpeg.decodeProgressive(Jpeg.encodeProgressive(
        w, h, planes, samp, al = al, restartInterval = rst))
      assert(prog.width == w && prog.height == h)
      assert(java.util.Arrays.equals(prog.rgb, seq420.rgb),
        s"rst=$rst al=$al")
    }
  }

  test("progressive decode handles grayscale and lossy quant tables") {
    val w = 17; val h = 11
    val mcusX = (w + 7) / 8; val mcusY = (h + 7) / 8
    val (yP, cbP, crP) = Jpeg.jpegSynthPlanes(42L, mcusX * 8, mcusY * 8)
    val gray = Jpeg.decodeProgressive(Jpeg.encodeProgressive(
      w, h, Seq(yP), Seq((1, 1)), al = 1))
    val graySeq = Jpeg.decodeBaseline(Jpeg.encodeBaseline(
      w, h, Seq(yP), Seq((1, 1))))
    assert(java.util.Arrays.equals(gray.rgb, graySeq.rgb))
    // realistic lossy tables: big AC magnitudes shrink, exercising the
    // successive-approximation significance transitions
    val ql = Jpeg.scaledQuant(Jpeg.StdQuantLuma, 85)
    val qc = Jpeg.scaledQuant(Jpeg.StdQuantChroma, 85)
    val lossySeq = Jpeg.decodeBaseline(Jpeg.encodeBaseline(
      w, h, Seq(yP, cbP, crP), Seq((1, 1), (1, 1), (1, 1)), ql, qc))
    val lossyProg = Jpeg.decodeProgressive(Jpeg.encodeProgressive(
      w, h, Seq(yP, cbP, crP), Seq((1, 1), (1, 1), (1, 1)), ql, qc, al = 3))
    assert(java.util.Arrays.equals(lossyProg.rgb, lossySeq.rgb))
  }

  test("progressive stress: lossy tables + deep approximation across " +
    "many plane patterns stays pixel-identical to sequential") {
    // strong quantization scatters sparse nonzero coefficients through
    // the zigzag order, driving the rare refinement shapes (long
    // zero-history runs -> ZRL-in-refinement, cross-block EOB runs with
    // buffered correction bits); any encoder/decoder desync breaks the
    // pixel-exact equality
    val ql = Jpeg.scaledQuant(Jpeg.StdQuantLuma, 50)
    val qc = Jpeg.scaledQuant(Jpeg.StdQuantChroma, 50)
    for (id <- 0L until 12L) {
      val w = (id % 13 + 12).toInt; val h = (id % 11 + 10).toInt
      val mcusX = (w + 7) / 8; val mcusY = (h + 7) / 8
      val (yP, cbP, crP) = Jpeg.jpegSynthPlanes(id * 7 + 3, mcusX * 8, mcusY * 8)
      val planes = Seq(yP, cbP, crP)
      val samp = Seq((1, 1), (1, 1), (1, 1))
      val seqImg = Jpeg.decodeBaseline(
        Jpeg.encodeBaseline(w, h, planes, samp, ql, qc))
      for (al <- Seq(1, 3); opt <- Seq(true, false)) {
        val prog = Jpeg.decodeProgressive(Jpeg.encodeProgressive(
          w, h, planes, samp, ql, qc, al = al,
          restartInterval = (id % 3).toInt, optimalTables = opt))
        assert(java.util.Arrays.equals(prog.rgb, seqImg.rgb),
          s"id=$id al=$al opt=$opt")
      }
    }
  }

  test("decodeBaseline still rejects progressive; decode dispatches it") {
    val w = 10; val h = 7
    val (yP, _, _) = Jpeg.jpegSynthPlanes(5L, 16, 8)
    val prog = Jpeg.encodeProgressive(w, h, Seq(yP), Seq((1, 1)), al = 1)
    intercept[IllegalArgumentException](Jpeg.decodeBaseline(prog))
    val img = Jpeg.decode(prog)
    assert(img.width == w && img.height == h)
  }

  test("out-of-scope and malformed streams throw, never hang") {
    val good = Jpeg.jpegSynth(5L, 9, 8)
    // progressive SOF2
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](Jpeg.decodeBaseline(prog))
    // truncation at every prefix must throw (not hang / not OOM)
    for (cut <- Seq(1, 2, 10, good.length / 2, good.length - 1))
      intercept[IllegalArgumentException](
        Jpeg.decodeBaseline(good.take(cut)))
    // absurd declared dimensions must be rejected before allocation
    val dims = good.clone()
    dims(sofAt + 5) = 0xff.toByte; dims(sofAt + 6) = 0xff.toByte
    dims(sofAt + 7) = 0xff.toByte; dims(sofAt + 8) = 0xff.toByte
    intercept[IllegalArgumentException](Jpeg.decodeBaseline(dims))
    intercept[IllegalArgumentException](Jpeg.decodeBaseline(null))
    intercept[IllegalArgumentException](
      Jpeg.decodeBaseline(Array[Byte](1, 2, 3)))
  }

  test("PNG decoder rejects FDICT zlib streams instead of spinning") {
    // hand-build a PNG whose IDAT declares a preset dictionary (FDICT):
    // legal zlib, invalid PNG — must throw, not loop forever
    val w = 2; val h = 2
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length); bb.put(typ.getBytes("US-ASCII")); bb.put(data)
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w); ihdr.putInt(h)
    ihdr.put(8.toByte); ihdr.put(2.toByte)
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    // zlib header with FDICT set: CMF=0x78, FLG needs FDICT bit (0x20)
    // and (CMF*256+FLG) % 31 == 0 -> 0x78 0xBC works, then a DICTID
    val fdictStream = Array[Byte](0x78, 0xbc.toByte, 1, 2, 3, 4, 0, 0)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val png = sig ++ chunk("IHDR", ihdr.array()) ++
      chunk("IDAT", fdictStream) ++ chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](Multimodal.pngDecodeRgb(png))
    // absurd IHDR dims are rejected before allocation
    val ihdr2 = java.nio.ByteBuffer.allocate(13)
    ihdr2.putInt(0x40000000); ihdr2.putInt(0x40000000)
    ihdr2.put(8.toByte); ihdr2.put(2.toByte)
    ihdr2.put(0.toByte); ihdr2.put(0.toByte); ihdr2.put(0.toByte)
    val png2 = sig ++ chunk("IHDR", ihdr2.array()) ++
      chunk("IDAT", Array[Byte](0x78, 0x01)) ++
      chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](Multimodal.pngDecodeRgb(png2))
  }

  // ------------------------------------------------------ Spark plumbing

  test("extractJpegPixels decodes a batch and flags bad payloads") {
    val rows = Seq(
      (1L, Jpeg.jpegSynth(1L, 9, 8)),
      (4L, Jpeg.jpegSynth(4L, 8, 8)), // id%4==0: restart-marker stream
      (9L, Array[Byte](1, 2, 3, 4))   // not a JPEG
    ).toDF("doc_id", "payload")
    val out = Multimodal.extractJpegPixels(rows, "doc_id", "payload")
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).valid && out(1L).width == 9 && out(1L).height == 8)
    assert(out(4L).valid && out(4L).width == 8)
    assert(!out(9L).valid && out(9L).pix_sum == 0L)
    // checksum matches the closed form for id=1
    var sum = 0L
    for (y <- 0 until 8; x <- 0 until 9) {
      val (r, g, b) = expectedRgb(1L, x, y)
      sum += r * 65536L + g * 256L + b
    }
    assert(out(1L).pix_sum == sum)
  }
}
