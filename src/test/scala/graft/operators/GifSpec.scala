package graft.operators

import graft.SparkTestBase

/** GIF/LZW codec verification: lossless roundtrips against the closed
  * synthesis form (the same form the DuckDB oracle replays), raw-LZW
  * properties, interlacing, and malformed-input rejection. */
class GifSpec extends SparkTestBase {
  import spark.implicits._

  private def expectedRgb(id: Long, x: Int, y: Int): (Int, Int, Int) = {
    val idi = (id % 1000).toInt
    val idx = (x * 7 + y * 13 + idi) % 256
    ((idx * 5 + 7) % 256, (idx * 11 + 3) % 256, (idx * 17 + 29) % 256)
  }

  test("gifSynth roundtrips bit-exactly (sequential and interlaced)") {
    // id % 3 == 0 synthesizes interlaced streams — both orders covered
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 42L, 999L, 123456L)) {
      val w = (id % 11 + 3).toInt
      val h = (id % 8 + 3).toInt
      val img = Gif.decodeGif(Gif.gifSynth(id, w, h))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val got = (img.rgb(o) & 0xff, img.rgb(o + 1) & 0xff,
          img.rgb(o + 2) & 0xff)
        assert(got == expectedRgb(id, x, y),
          s"id=$id pixel ($x,$y): got $got want ${expectedRgb(id, x, y)}")
      }
    }
  }

  test("LZW roundtrips arbitrary index streams, including repetitive " +
    "runs that grow the dictionary and overflow it") {
    val rnd = new scala.util.Random(11)
    for (minCode <- Seq(2, 4, 8)) {
      val nSyms = 1 << minCode
      // three shapes: random, heavily repetitive (dictionary growth +
      // KwKwK patterns), and one long run (forces 4096-entry overflow
      // + mid-stream clear at minCode 2)
      val streams = Seq(
        Array.fill(500)(rnd.nextInt(nSyms).toByte),
        Array.tabulate(3000)(i => ((i / 7) % nSyms).toByte),
        Array.fill(30000)(1.toByte))
      for (s <- streams) {
        val enc = Gif.lzwEncode(s, minCode)
        val dec = Gif.lzwDecode(enc, minCode, s.length)
        assert(dec.length == s.length &&
          java.util.Arrays.equals(dec, s),
          s"minCode=$minCode len=${s.length} roundtrip mismatch")
        // real compression on the repetitive shapes, not code bloat
        if (s.length >= 3000) assert(enc.length < s.length)
      }
    }
  }

  test("interlace row order is the four standard passes") {
    assert(Gif.interlaceRows(10) ==
      Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9))
    assert(Gif.interlaceRows(1) == Seq(0))
    // a permutation of all rows at any height
    for (h <- 1 to 30)
      assert(Gif.interlaceRows(h).sorted == (0 until h))
  }

  test("GIF87a headers and local color tables decode") {
    // hand-assembled: no global table, the image carries a 2-color LOCAL
    // table; GIF87a signature
    val pal = Array[Byte](10, 20, 30, 40, 50, 60)
    val idx = Array[Byte](0, 1, 1, 0)
    val lzw = Gif.lzwEncode(idx, 2)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(2); u16(2); out.write(0x00); out.write(0); out.write(0) // no GCT
    out.write(0x2c); u16(0); u16(0); u16(2); u16(2)
    out.write(0x80) // LCT flag, size exp 0 -> 2 colors
    out.write(pal, 0, pal.length)
    out.write(2) // LZW min code size
    out.write(lzw.length); out.write(lzw, 0, lzw.length); out.write(0)
    out.write(0x3b)
    val img = Gif.decodeGif(out.toByteArray)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60,
      40, 50, 60, 10, 20, 30))
  }

  test("malformed GIFs throw rather than mis-decode") {
    val good = Gif.gifSynth(5L, 9, 6)
    intercept[IllegalArgumentException](Gif.decodeGif(null))
    intercept[IllegalArgumentException](
      Gif.decodeGif("NOTAGIF!!".getBytes))
    for (cut <- Seq(4, 12, 20, good.length / 2, good.length - 2))
      intercept[IllegalArgumentException](Gif.decodeGif(good.take(cut)))
    // absurd dimensions rejected before allocation
    val big = good.clone()
    big(6) = 0xff.toByte; big(7) = 0xff.toByte
    big(8) = 0xff.toByte; big(9) = 0xff.toByte
    intercept[IllegalArgumentException](Gif.decodeGif(big))
  }

  test("decodeImageRgb dispatches PNG/GIF/BMP to identical pixels") {
    val w = 9; val h = 8
    val gray = Array.tabulate(w * h)(i => ((i * 37 + 5) % 256))
    val rgb = Array.tabulate(w * h * 3)(i => gray(i / 3).toByte)
    val pal = Array.tabulate(256 * 3)(i => (i / 3).toByte)
    val png = Multimodal.decodeImageRgb(Multimodal.pngEncodeRgb(w, h, rgb))
    val gif = Multimodal.decodeImageRgb(
      Gif.encodeGif(w, h, pal, gray.map(_.toByte)))
    val bmp = Multimodal.decodeImageRgb(Multimodal.bmpEncodeRgb(w, h, rgb))
    assert(png._1 == w && png._2 == h)
    assert(java.util.Arrays.equals(png._3, rgb))
    assert(java.util.Arrays.equals(gif._3, rgb))
    assert(java.util.Arrays.equals(bmp._3, rgb))
    // the JPEG branch dispatches too (lossy: dims only)
    val jp = Multimodal.decodeImageRgb(Jpeg.jpegSynth(1L, 9, 8))
    assert(jp._1 == 9 && jp._2 == 8)
    intercept[IllegalArgumentException](
      Multimodal.decodeImageRgb("no image here".getBytes))
  }

  test("dHash is brightness-invariant and pairs have exact recall") {
    val w = 9; val h = 8
    def img(seed: Int, bump: Int): Array[Byte] = {
      val gray = Array.tabulate(w * h) { i =>
        val x = i % 9; val y = i / 9
        (x * (3 + seed % 5) + y * (7 + seed % 3) + seed * 13) % 200 + 28 +
          (if (bump == 1 && x == 0 && y == 0) 1 else 0)
      }
      Array.tabulate(w * h * 3)(i => gray(i / 3).toByte)
    }
    // global +1 brightness never changes a comparison
    val base = img(7, 0)
    val brighter = base.map(b => ((b & 0xff) + 1).toByte)
    assert(Multimodal.dHash64(base, w, h) ==
      Multimodal.dHash64(brighter, w, h))
    // exact recall: blocked pairs == brute force over the hashes
    val docs = (0L until 20L).map { id =>
      (id, Multimodal.pngEncodeRgb(w, h, img((id / 2).toInt, (id % 2).toInt)))
    }.toDF("doc_id", "payload")
    val got = Multimodal.imageDHashPairs(docs, "doc_id", "payload",
        maxHamming = 4)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    val hashes = (0L until 20L).map { id =>
      id -> Multimodal.dHash64(img((id / 2).toInt, (id % 2).toInt), w, h)
    }
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } yield (a, b, d)).toSet
    assert(got == brute)
    // every intra-group pair survives (the bump flips at most bit 0)
    for (g <- 0L until 10L)
      assert(got.exists(p => p._1 == 2 * g && p._2 == 2 * g + 1),
        s"group $g pair missing")
  }

  test("extractWavSpectrum finds the synthesized tone's bin") {
    def tone(k0: Int, amp: Int = 1000): Array[Byte] =
      Multimodal.wavSynth(1, 8000, (0 until 64).map(x => math.floor(
        amp * math.sin(2 * math.Pi * k0 * x / 64) + 0.5).toInt.toShort))
    val rows = Seq(
      (1L, tone(5)),
      (2L, tone(19)),
      (3L, Multimodal.wavSynth(1, 8000, Seq.fill(8)(0.toShort))), // too short
      (4L, Array[Byte](1, 2, 3)) // not a WAV
    ).toDF("doc_id", "payload")
    val out = Multimodal.extractWavSpectrum(rows, "doc_id", "payload")
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).valid && out(1L).peak_bin == 5)
    assert(out(2L).valid && out(2L).peak_bin == 19)
    // |DFT| at the tone bin is ~ N*A/2 = 32000 for a pure sine
    assert(math.abs(out(1L).peak_mag - 32000.0) < 50.0,
      s"peak magnitude ${out(1L).peak_mag}")
    assert(!out(3L).valid && !out(4L).valid)
  }

  test("extractGifPixels decodes a batch and flags bad payloads") {
    val rows = Seq(
      (3L, Gif.gifSynth(3L, 9, 6)),   // interlaced (3 % 3 == 0)
      (4L, Gif.gifSynth(4L, 7, 7)),
      (9L, Array[Byte](9, 9, 9, 9))
    ).toDF("doc_id", "payload")
    val out = Multimodal.extractGifPixels(rows, "doc_id", "payload")
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(3L).valid && out(3L).width == 9 && out(3L).height == 6)
    assert(out(4L).valid && out(4L).width == 7)
    assert(!out(9L).valid)
    var sum = 0L
    for (y <- 0 until 6; x <- 0 until 9) {
      val (r, g, b) = expectedRgb(3L, x, y)
      sum += r * 65536L + g * 256L + b
    }
    assert(out(3L).pix_sum == sum)
  }
}
