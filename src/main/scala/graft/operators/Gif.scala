package graft.operators

/** GIF87a/89a codec in pure JVM arithmetic — the third real image codec
  * beside [[Multimodal.pngDecodeRgb]] (zlib) and [[Jpeg]] (Huffman/DCT):
  * GIF's compression is LZW with variable-width codes packed LSB-first,
  * which is plain integer/bit arithmetic end to end.
  *
  * Scope: single-frame decode (first image descriptor wins; animation
  * frames after it are ignored), global and local color tables,
  * interlaced and sequential row order, extension blocks skipped.
  * GIF is lossless, so — like PNG and unlike JPEG — the DuckDB oracle
  * replays synthesized images exactly with no DCT-span tricks needed.
  */
object Gif {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  // --------------------------------------------------------------- LZW

  /** Decode a GIF LZW stream (codes packed LSB-first) to pixel indices.
    * @param data concatenated sub-block payload bytes
    * @param minCodeSize LZW minimum code size from the stream
    * @param maxPixels expected pixel count (stop + bound allocations) */
  def lzwDecode(data: Array[Byte], minCodeSize: Int,
                maxPixels: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, "bad LZW min code size")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    // dictionary as (prefix code, appended byte); roots are -1-prefixed
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new java.io.ByteArrayOutputStream(maxPixels)
    var next = clear + 2
    var width = minCodeSize + 1
    var prev = -1
    var acc = 0L
    var nbits = 0
    var pos = 0
    val stack = new Array[Byte](4096)
    def expand(code0: Int): Int = {
      // emit dict[code0] (walking the prefix chain via a stack) and
      // return its FIRST byte
      var sp = 0
      var code = code0
      while (code >= clear + 2) {
        stack(sp) = suffix(code); sp += 1
        require(sp < stack.length, "corrupt LZW chain")
        code = prefix(code)
      }
      require(code < clear, "corrupt LZW code chain")
      val first = code
      stack(sp) = code.toByte; sp += 1
      while (sp > 0) { sp -= 1; out.write(stack(sp)) }
      first
    }
    var done = false
    while (!done) {
      while (nbits < width && pos < data.length) {
        acc |= (data(pos) & 0xffL) << nbits
        nbits += 8; pos += 1
      }
      require(nbits >= width, "truncated LZW stream (no EOI)")
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width; nbits -= width
      if (code == clear) {
        next = clear + 2; width = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        require(code < clear, "first code after clear must be a root")
        out.write(code)
        prev = code
      } else {
        require(code <= next, "LZW code beyond dictionary")
        val first =
          if (code == next) { // KwKwK case: entry = prev + first(prev)
            val f = expand(prev)
            out.write(f) // expand wrote dict[prev]; append its first byte
            f
          } else expand(code)
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first.toByte
          next += 1
          if (next < 4096 && next == (1 << width)) width += 1
        }
        prev = code
      }
      require(out.size() <= maxPixels + 4096, "LZW output overruns image")
    }
    out.toByteArray
  }

  /** Real LZW encode of pixel indices (dictionary-building, width growth,
    * clear-on-full) — not the fixed-width "uncompressed GIF" shortcut, so
    * decoders exercise the whole dictionary path. */
  def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, "bad LZW min code size")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    var width = minCodeSize + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    // dict: (prevCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = clear + 2
    put(clear)
    var prev = -1
    var i = 0
    while (i < indices.length) {
      val k = indices(i) & 0xff
      require(k < clear, s"pixel index $k exceeds palette")
      if (prev < 0) prev = k
      else {
        val key = Integer.valueOf((prev << 8) | k)
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          if (next < 4096) {
            dict.put(key, Integer.valueOf(next))
            next += 1
            // the decoder defines entry i one CODE later than the encoder
            // does, so its width bump (at next == 1<<width) lands one add
            // later too — the encoder must bump at (1<<width) + 1 or the
            // reader underruns by a bit at every boundary
            if (next < 4096 && next == (1 << width) + 1) width += 1
            // (at next == 4096 the decoder freezes its table too)
          } else {
            put(clear) // table full: reset both sides
            dict = new java.util.HashMap[Integer, Integer]()
            next = clear + 2
            width = minCodeSize + 1
          }
          prev = k
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev)
    put(eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  // --------------------------------------------------------------- codec

  /** Interlace pass row order: (start, step) per pass. */
  private val InterlacePasses = Seq((0, 8), (4, 8), (2, 4), (1, 2))

  /** Row indices in stream order for an interlaced image of height h. */
  def interlaceRows(h: Int): Seq[Int] =
    InterlacePasses.flatMap { case (start, step) => start until h by step }

  final case class GifImage(width: Int, height: Int, rgb: Array[Byte])

  /** Decode the first frame of a GIF to RGB. Throws
    * IllegalArgumentException on malformed/truncated input. */
  def decodeGif(p: Array[Byte]): GifImage = {
    require(p != null && p.length >= 13, "not a GIF")
    val sig = new String(p, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", "not a GIF")
    val screenW = le16(p, 6); val screenH = le16(p, 8)
    val packed = p(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 0x07)
      require(pos + 3 * n <= p.length, "truncated global color table")
      gct = java.util.Arrays.copyOfRange(p, pos, pos + 3 * n)
      pos += 3 * n
    }
    require(screenW > 0 && screenH > 0 &&
      screenW.toLong * screenH <= (1L << 26), "unreasonable dimensions")
    while (pos < p.length) {
      (p(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          require(pos <= p.length, "truncated extension")
          var len = if (pos < p.length) p(pos) & 0xff else -1
          while (len > 0) {
            pos += 1 + len
            require(pos < p.length, "truncated extension blocks")
            len = p(pos) & 0xff
          }
          require(len == 0, "truncated extension terminator")
          pos += 1
        case 0x2c => // image descriptor
          require(pos + 10 <= p.length, "truncated image descriptor")
          val ix = le16(p, pos + 1); val iy = le16(p, pos + 3)
          val iw = le16(p, pos + 5); val ih = le16(p, pos + 7)
          val ipack = p(pos + 9) & 0xff
          pos += 10
          require(iw > 0 && ih > 0 && ix == 0 && iy == 0 &&
            iw == screenW && ih == screenH,
            "only full-screen first frames supported")
          val interlaced = (ipack & 0x40) != 0
          var table = gct
          if ((ipack & 0x80) != 0) {
            val n = 2 << (ipack & 0x07)
            require(pos + 3 * n <= p.length, "truncated local color table")
            table = java.util.Arrays.copyOfRange(p, pos, pos + 3 * n)
            pos += 3 * n
          }
          require(table != null, "no color table")
          require(pos < p.length, "truncated before LZW data")
          val minCode = p(pos) & 0xff
          pos += 1
          // concatenate data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var len = if (pos < p.length) p(pos) & 0xff else -1
          while (len > 0) {
            require(pos + 1 + len <= p.length, "truncated data sub-block")
            data.write(p, pos + 1, len)
            pos += 1 + len
            require(pos < p.length, "truncated sub-block chain")
            len = p(pos) & 0xff
          }
          require(len == 0, "missing sub-block terminator")
          val nPix = iw * ih
          val idx = lzwDecode(data.toByteArray, minCode, nPix)
          require(idx.length >= nPix,
            s"LZW decoded ${idx.length} of $nPix pixels")
          val nColors = table.length / 3
          val rgb = new Array[Byte](nPix * 3)
          val rows: Seq[Int] =
            if (interlaced) interlaceRows(ih) else 0 until ih
          var streamRow = 0
          rows.foreach { y =>
            var x = 0
            while (x < iw) {
              val ci = idx(streamRow * iw + x) & 0xff
              require(ci < nColors, s"pixel index $ci outside palette")
              val o = (y * iw + x) * 3
              rgb(o) = table(ci * 3)
              rgb(o + 1) = table(ci * 3 + 1)
              rgb(o + 2) = table(ci * 3 + 2)
              x += 1
            }
            streamRow += 1
          }
          return GifImage(iw, ih, rgb)
        case 0x3b =>
          throw new IllegalArgumentException("trailer before any image")
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x")
      }
    }
    throw new IllegalArgumentException("no image descriptor")
  }

  /** Encode indexed pixels (+ a 3*n RGB palette) as a GIF89a stream. */
  def encodeGif(width: Int, height: Int, palette: Array[Byte],
                indices: Array[Byte], interlaced: Boolean = false)
      : Array[Byte] = {
    val nColors = palette.length / 3
    require(nColors >= 2 && nColors <= 256 &&
      Integer.bitCount(nColors) == 1 && palette.length == nColors * 3,
      "palette must hold a power-of-two color count (2..256)")
    require(indices.length == width * height, "index plane size mismatch")
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      "bad dimensions")
    val exp = 31 - Integer.numberOfLeadingZeros(nColors) // log2
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    out.write(0x80 | ((exp - 1) & 0x07) << 4 | ((exp - 1) & 0x07)) // GCT on
    out.write(0); out.write(0) // bg index, aspect
    out.write(palette, 0, palette.length)
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(if (interlaced) 0x40 else 0x00)
    val minCode = math.max(2, exp)
    out.write(minCode)
    val ordered =
      if (!interlaced) indices
      else {
        val a = new Array[Byte](indices.length)
        var streamRow = 0
        interlaceRows(height).foreach { y =>
          System.arraycopy(indices, y * width, a, streamRow * width, width)
          streamRow += 1
        }
        a
      }
    val lzw = lzwEncode(ordered, minCode)
    var off = 0
    while (off < lzw.length) { // ≤255-byte sub-blocks
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0) // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ----------------------------------------------- deterministic synthesis

  /** Deterministic 256-color palette + index plane, the closed forms the
    * DuckDB oracle replays: pal[i] = ((i*5+7)%256, (i*11+3)%256,
    * (i*17+29)%256); idx(x,y) = (x*7 + y*13 + id%1000) % 256. */
  def gifSynth(id: Long, w: Int, h: Int): Array[Byte] = {
    val idi = (id % 1000).toInt
    val pal = new Array[Byte](256 * 3)
    var i = 0
    while (i < 256) {
      pal(i * 3) = ((i * 5 + 7) % 256).toByte
      pal(i * 3 + 1) = ((i * 11 + 3) % 256).toByte
      pal(i * 3 + 2) = ((i * 17 + 29) % 256).toByte
      i += 1
    }
    val idx = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        idx(y * w + x) = ((x * 7 + y * 13 + idi) % 256).toByte
        x += 1
      }
      y += 1
    }
    encodeGif(w, h, pal, idx, interlaced = id % 3 == 0)
  }
}
