package graft.operators

/** ISO-BMFF (MP4) container metadata walk — the video leg of the
  * multimodal column set (image and audio already decode for real;
  * SAMPLE decode of compressed video is out of scope, but the container
  * walk below is what a 100 TB ingest routes and budgets video on:
  * duration, track count, codec fourcc, dimensions).
  *
  * Box grammar per ISO/IEC 14496-12 (public spec): a box is a 32-bit
  * big-endian size then a 4-char type; `size == 1` switches to a 64-bit
  * largesize after the type; `size == 0` means "to end of enclosing
  * container"; unknown boxes are skipped BY SIZE (the property that
  * makes the format forward-compatible and the walk O(#boxes), never
  * O(bytes)). Parsed here: `ftyp` (major brand), `moov/mvhd` (timescale
  * + duration, version 0 and 1), `moov/trak/mdia/hdlr` (handler:
  * vide/soun), `moov/trak/mdia/minf/stbl/stsd` (codec fourcc), and
  * `moov/trak/tkhd` (16.16 fixed-point width/height, versions 0/1).
  *
  * Scale shape: a pure per-row JVM function over binary payloads
  * (mapPartitions batches via the typed map; no UDF-in-join hot path,
  * no driver traffic). Parity contract: [[mp4Synth]] builds real nested
  * boxes and [[mp4Meta]] re-derives every field by walking them — the
  * registered query's oracle is the closed form of the synthesis
  * parameters (the mm_mp3_meta pattern, `SparkEntry` mm rows).
  */
object Mp4 {

  final case class Mp4Meta(doc_id: Long, n_bytes: Long, major_brand: String,
                           timescale: Int, duration_ms: Long, n_tracks: Int,
                           video_codec: String, audio_codec: String,
                           width: Int, height: Int, valid: Boolean)

  // ------------------------------------------------------------ synth

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: $s")
    s.getBytes("US-ASCII")
  }

  /** One box: 32-bit size header + type + payload. */
  def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ fourcc(typ) ++ body
  }

  /** mvhd version 0: creation/modification zeroed, rate/volume default. */
  private def mvhd(timescale: Int, duration: Long): Array[Byte] =
    box("mvhd", be32(0), // version 0 + flags
      be32(0), be32(0), // creation, modification
      be32(timescale), be32(duration),
      be32(0x00010000L), // rate 1.0
      Array(0x01.toByte, 0x00.toByte, 0, 0), // volume 1.0 + reserved
      new Array[Byte](8), // reserved
      // identity matrix
      be32(0x00010000L), be32(0), be32(0),
      be32(0), be32(0x00010000L), be32(0),
      be32(0), be32(0), be32(0x40000000L),
      new Array[Byte](24), // pre_defined
      be32(2)) // next_track_ID

  private def tkhd(trackId: Int, duration: Long, w: Int, h: Int): Array[Byte] =
    box("tkhd", be32(7), // version 0, flags: enabled+in-movie+in-preview
      be32(0), be32(0), be32(trackId), be32(0), be32(duration),
      new Array[Byte](8), // reserved
      new Array[Byte](4), // layer + alternate_group
      new Array[Byte](4), // volume + reserved
      be32(0x00010000L), be32(0), be32(0),
      be32(0), be32(0x00010000L), be32(0),
      be32(0), be32(0), be32(0x40000000L),
      be32(w.toLong << 16), be32(h.toLong << 16)) // 16.16 fixed

  private def mdhd(timescale: Int, duration: Long): Array[Byte] =
    box("mdhd", be32(0), be32(0), be32(0), be32(timescale), be32(duration),
      Array(0x55.toByte, 0xc4.toByte, 0, 0)) // language 'und' + pre_defined

  private def hdlr(handler: String): Array[Byte] =
    box("hdlr", be32(0), be32(0), fourcc(handler), new Array[Byte](12),
      Array(0.toByte)) // empty name, NUL-terminated

  /** Minimal stsd with one sample entry of the given fourcc (the entry
    * body is format-specific; the walk only reads the fourcc, so a
    * fixed-size stub body keeps the synth compact and the size fields
    * honest). */
  private def stsd(codec: String): Array[Byte] =
    box("stsd", be32(0), be32(1), // entry_count 1
      box(codec, new Array[Byte](8))) // 6 reserved + 2 data_reference_index

  private def trak(trackId: Int, handler: String, codec: String,
                   timescale: Int, duration: Long, w: Int,
                   h: Int): Array[Byte] =
    box("trak",
      tkhd(trackId, duration, w, h),
      box("mdia",
        mdhd(timescale, duration),
        hdlr(handler),
        box("minf", box("stbl", stsd(codec)))))

  /** A real nested ISO-BMFF file: ftyp + moov(mvhd, traks) + mdat stub,
    * plus a `free` box the walk must skip by size. */
  def mp4Synth(majorBrand: String, timescale: Int, duration: Long,
               videoCodec: String, width: Int, height: Int,
               withAudio: Boolean, mdatBytes: Int): Array[Byte] = {
    val ftyp = box("ftyp", fourcc(majorBrand), be32(0x200),
      fourcc("isom"), fourcc(majorBrand))
    val traks = trak(1, "vide", videoCodec, timescale, duration,
        width, height) ++
      (if (withAudio) trak(2, "soun", "mp4a", timescale, duration, 0, 0)
       else Array.empty[Byte])
    val moov = box("moov", mvhd(timescale, duration), traks)
    val free = box("free", new Array[Byte](6))
    val mdat = box("mdat", new Array[Byte](mdatBytes))
    ftyp ++ free ++ moov ++ mdat
  }

  // ------------------------------------------------------------ walk

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def typeAt(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Children of the container spanning [from, to): (type, bodyFrom,
    * bodyTo) triples; None on structural corruption (truncated header,
    * size pointing outside the container — the walk REFUSES rather than
    * guessing). */
  private def children(b: Array[Byte], from: Int,
                       to: Int): Option[List[(String, Int, Int)]] = {
    val out = List.newBuilder[(String, Int, Int)]
    var off = from
    while (off < to) {
      if (off + 8 > to) return None
      val size32 = u32(b, off)
      val typ = typeAt(b, off + 4)
      val (bodyFrom, end) =
        if (size32 == 0) (off + 8, to) // to end of enclosing box
        else if (size32 == 1) {
          if (off + 16 > to) return None
          val ls = u64(b, off + 8)
          if (ls < 16 || off + ls > to) return None
          (off + 16, off + ls.toInt)
        } else {
          if (size32 < 8 || off + size32 > to) return None
          (off + 8, off + size32.toInt)
        }
      out += ((typ, bodyFrom, end))
      off = end
    }
    Some(out.result())
  }

  private def find(cs: List[(String, Int, Int)],
                   typ: String): Option[(Int, Int)] =
    cs.collectFirst { case (t, f, e) if t == typ => (f, e) }

  /** Walk one payload. Invalid (no ftyp/moov/mvhd, corrupt sizes,
    * truncation) yields `valid = false` with zeroed fields — sniffing
    * never throws on a 100 TB corpus. */
  def mp4Meta(id: Long, bytes: Array[Byte]): Mp4Meta = {
    val bad = Mp4Meta(id, if (bytes == null) 0L else bytes.length.toLong,
      "", 0, 0L, 0, "", "", 0, 0, valid = false)
    if (bytes == null || bytes.length < 16) return bad
    children(bytes, 0, bytes.length) match {
      case None => bad
      case Some(top) =>
        val brand = find(top, "ftyp") match {
          case Some((f, e)) if e - f >= 8 => typeAt(bytes, f)
          case _ => return bad
        }
        val (moovF, moovE) = find(top, "moov").getOrElse(return bad)
        children(bytes, moovF, moovE) match {
          case None => bad
          case Some(moovKids) =>
            val (ts, durUnits) = find(moovKids, "mvhd") match {
              case Some((f, e)) if e - f >= 4 =>
                val version = bytes(f) & 0xff
                if (version == 1) {
                  if (e - f < 28) return bad
                  (u32(bytes, f + 20).toInt, u64(bytes, f + 24))
                } else {
                  if (e - f < 20) return bad
                  (u32(bytes, f + 12).toInt, u32(bytes, f + 16))
                }
              case _ => return bad
            }
            if (ts <= 0) return bad
            var nTracks = 0
            var vCodec = ""; var aCodec = ""
            var w = 0; var h = 0
            moovKids.foreach {
              case ("trak", tf, te) =>
                nTracks += 1
                for {
                  kids <- children(bytes, tf, te)
                  (mf, me) <- find(kids, "mdia")
                  mdiaKids <- children(bytes, mf, me)
                } {
                  val handler = find(mdiaKids, "hdlr") match {
                    case Some((hf, he)) if he - hf >= 12 =>
                      typeAt(bytes, hf + 8)
                    case _ => ""
                  }
                  val codec = (for {
                    (nf, ne) <- find(mdiaKids, "minf")
                    minfKids <- children(bytes, nf, ne)
                    (sf, se) <- find(minfKids, "stbl")
                    stblKids <- children(bytes, sf, se)
                    (df, de) <- find(stblKids, "stsd")
                    // stsd: version+flags, entry_count, then entries
                    entries <- if (de - df >= 16) children(bytes, df + 8, de)
                               else None
                    first <- entries.headOption
                  } yield first._1).getOrElse("")
                  if (handler == "vide" && vCodec.isEmpty) {
                    vCodec = codec
                    // tkhd width/height (16.16 fixed): last 8 body bytes
                    find(kids, "tkhd").foreach { case (kf, ke) =>
                      if (ke - kf >= 8) {
                        w = (u32(bytes, ke - 8) >>> 16).toInt
                        h = (u32(bytes, ke - 4) >>> 16).toInt
                      }
                    }
                  } else if (handler == "soun" && aCodec.isEmpty)
                    aCodec = codec
                }
              case _ => ()
            }
            Mp4Meta(id, bytes.length.toLong, brand, ts,
              durUnits * 1000L / ts, nTracks, vCodec, aCodec, w, h,
              valid = true)
        }
    }
  }

  // ------------------------------------------- sample tables (video)

  /** stts with one run: every sample lasts `delta` media units. */
  def stts(count: Int, delta: Int): Array[Byte] =
    box("stts", be32(0), be32(1), be32(count.toLong), be32(delta.toLong))

  /** stsc runs: (first_chunk, samples_per_chunk) pairs, 1-based chunks. */
  def stsc(runs: Seq[(Int, Int)]): Array[Byte] =
    box("stsc", be32(0) +: be32(runs.length.toLong) +:
      runs.flatMap { case (fc, spc) =>
        Seq(be32(fc.toLong), be32(spc.toLong), be32(1)) }: _*)

  /** stsz with explicit per-sample sizes (sample_size field 0). */
  def stsz(sizes: Seq[Int]): Array[Byte] =
    box("stsz", be32(0) +: be32(0) +: be32(sizes.length.toLong) +:
      sizes.map(s => be32(s.toLong)): _*)

  /** stco chunk offsets (absolute file offsets). */
  def stco(offsets: Seq[Long]): Array[Byte] =
    box("stco", be32(0) +: be32(offsets.length.toLong) +:
      offsets.map(be32): _*)

  /** A playable-shape MJPEG-in-MP4: `[ftyp][mdat frames…][moov]` with a
    * REAL sample table (stts/stsc/stsz/stco) addressing each frame's
    * byte range inside mdat. mdat-before-moov keeps the chunk offset
    * known while the moov is assembled (the classic non-faststart
    * layout). All frames land in ONE chunk; [[videoFrames]] expands the
    * general multi-chunk grammar regardless. */
  def mp4SynthVideo(frames: Seq[Array[Byte]], timescale: Int,
                    frameDur: Int, w: Int, h: Int,
                    codec: String = "mjpa"): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val ftyp = box("ftyp", fourcc("isom"), be32(0x200),
      fourcc("isom"), fourcc("mp42"))
    val mdat = box("mdat", frames: _*)
    val mdatBodyOff = ftyp.length + 8L
    val durUnits = frames.length.toLong * frameDur
    val stbl = box("stbl", stsd(codec), stts(frames.length, frameDur),
      stsc(Seq((1, frames.length))), stsz(frames.map(_.length)),
      stco(Seq(mdatBodyOff)))
    val trakBox = box("trak",
      tkhd(1, durUnits, w, h),
      box("mdia",
        mdhd(timescale, durUnits),
        hdlr("vide"),
        box("minf", stbl)))
    val moov = box("moov", mvhd(timescale, durUnits), trakBox)
    ftyp ++ mdat ++ moov
  }

  /** One addressable video sample: index, absolute byte range, and
    * presentation time in media units. */
  final case class FrameRef(idx: Int, offset: Int, size: Int, pts: Long)

  /** Resolve the video track's per-frame byte ranges from its sample
    * table — the general grammar: stco chunk offsets, stsc runs mapping
    * samples to chunks (each run holds until the next run's
    * first_chunk), stsz per-sample sizes (or the constant sample_size),
    * stts duration runs accumulated to pts. Returns (media timescale,
    * frames) or None when any table is missing, inconsistent, or points
    * outside the payload — a 100 TB walk refuses, it never guesses. */
  def videoFrames(bytes: Array[Byte]): Option[(Int, Seq[FrameRef])] = {
    if (bytes == null || bytes.length < 16) return None
    for {
      top <- children(bytes, 0, bytes.length)
      (moovF, moovE) <- find(top, "moov")
      moovKids <- children(bytes, moovF, moovE)
      trakStbl <- moovKids.flatMap { // first VIDEO trak, not first trak
        case ("trak", tf, te) =>
          (for {
            kids <- children(bytes, tf, te)
            (mf, me) <- find(kids, "mdia")
            mdiaKids <- children(bytes, mf, me)
            (hf, he) <- find(mdiaKids, "hdlr")
            if he - hf >= 12 && typeAt(bytes, hf + 8) == "vide"
            (df, de) <- find(mdiaKids, "mdhd")
            if de - df >= 20
            (nf, ne) <- find(mdiaKids, "minf")
            minfKids <- children(bytes, nf, ne)
            (sf, se) <- find(minfKids, "stbl")
            stblKids <- children(bytes, sf, se)
          } yield (u32(bytes, df + 12).toInt, stblKids)).toList
        case _ => Nil
      }.headOption
      (ts, stblKids) = trakStbl
      if ts > 0
      (szF, szE) <- find(stblKids, "stsz")
      if szE - szF >= 12
      (coF, coE) <- find(stblKids, "stco")
      if coE - coF >= 8
      (scF, scE) <- find(stblKids, "stsc")
      if scE - scF >= 8
      (ttF, ttE) <- find(stblKids, "stts")
      if ttE - ttF >= 8
      frames <- resolveFrames(bytes, szF, szE, coF, coE, scF, scE, ttF, ttE)
    } yield (ts, frames)
  }

  private def resolveFrames(b: Array[Byte], szF: Int, szE: Int, coF: Int,
                            coE: Int, scF: Int, scE: Int, ttF: Int,
                            ttE: Int): Option[Seq[FrameRef]] = {
    val constSize = u32(b, szF + 4)
    val nSamples = u32(b, szF + 8).toInt
    if (nSamples <= 0 || nSamples > (1 << 20)) return None
    if (constSize == 0 && szE - szF < 12 + 4 * nSamples) return None
    // u32 values are validated as Longs BEFORE the Int narrowing: a
    // sample size >= 2^31 would wrap negative, shrink the off+size bound
    // below, and emit a bogus FrameRef instead of the contract's None
    if (constSize > Int.MaxValue) return None
    val sizesL = (0 until nSamples).map { i =>
      if (constSize != 0) constSize else u32(b, szF + 12 + 4 * i)
    }
    if (sizesL.exists(_ > Int.MaxValue)) return None
    val sizes = sizesL.map(_.toInt)
    // count fields are u32 too: cap BEFORE any Int bound math — 4*n / 12*n
    // in Int would overflow for a 2^29-entry count and the byte-bound
    // check would compare against a negative number and pass
    val nChunksL = u32(b, coF + 4)
    if (nChunksL <= 0 || nChunksL > (1 << 20) ||
      (coE - coF).toLong < 8 + 4 * nChunksL) return None
    val nChunks = nChunksL.toInt
    val chunkOffs = (0 until nChunks).map(i => u32(b, coF + 8 + 4 * i))
    val nRunsL = u32(b, scF + 4)
    if (nRunsL <= 0 || nRunsL > (1 << 20) ||
      (scE - scF).toLong < 8 + 12 * nRunsL) return None
    val nRuns = nRunsL.toInt
    val runsL = (0 until nRuns).map { i =>
      (u32(b, scF + 8 + 12 * i), u32(b, scF + 12 + 12 * i))
    }
    // first_chunk / samples_per_chunk are u32 too — same wrap hazard
    if (runsL.exists(r => r._1 > Int.MaxValue || r._2 > Int.MaxValue))
      return None
    val runs = runsL.map(r => (r._1.toInt, r._2.toInt))
    // samples per chunk: each stsc run holds from its first_chunk until
    // the next run's first_chunk
    val perChunk = (0 until nChunks).map { c =>
      val run = runs.takeWhile(_._1 <= c + 1).lastOption.getOrElse(runs.head)
      run._2
    }
    // Long accumulation: nChunks * samples_per_chunk can exceed Int
    if (perChunk.foldLeft(0L)(_ + _) < nSamples) return None
    // stts runs -> per-sample pts (same u32 cap + Long bound math)
    val nTtRunsL = u32(b, ttF + 4)
    if (nTtRunsL <= 0 || nTtRunsL > (1 << 20) ||
      (ttE - ttF).toLong < 8 + 8 * nTtRunsL) return None
    val nTtRuns = nTtRunsL.toInt
    val deltas = Array.newBuilder[Long]
    var acc = 0L
    var produced = 0
    var r = 0
    while (r < nTtRuns && produced < nSamples) {
      val cnt = u32(b, ttF + 8 + 8 * r).toInt
      val d = u32(b, ttF + 12 + 8 * r)
      var k = 0
      while (k < cnt && produced < nSamples) {
        deltas += acc; acc += d; produced += 1; k += 1
      }
      r += 1
    }
    if (produced < nSamples) return None
    val pts = deltas.result()
    // walk chunks, laying samples head-to-tail from each chunk offset
    val out = Seq.newBuilder[FrameRef]
    var s = 0
    var c = 0
    while (s < nSamples && c < nChunks) {
      var off = chunkOffs(c)
      var k = 0
      while (k < perChunk(c) && s < nSamples) {
        if (off < 0 || off + sizes(s) > b.length) return None
        out += FrameRef(s, off.toInt, sizes(s), pts(s))
        off += sizes(s); s += 1; k += 1
      }
      c += 1
    }
    if (s < nSamples) None else Some(out.result())
  }
}
