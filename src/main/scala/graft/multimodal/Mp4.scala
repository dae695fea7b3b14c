package graft.multimodal

/** Native ISO-BMFF (MP4/MOV) container parsing — the video-container twin
  * of [[Multimodal.mjpegAviFrames]]'s RIFF walk, closing the "video beyond
  * MJPEG-in-AVI" seam at the container level.
  *
  * An MP4 is a tree of length-prefixed big-endian boxes. Frame bytes live
  * in `mdat`, but their layout is described entirely by the sample tables
  * under `moov/trak/mdia/minf/stbl`:
  *
  *   - `stsd` — the codec fourcc and coded width/height,
  *   - `stsz` — per-sample byte sizes,
  *   - `stsc` — the chunk map (runs of "chunks `first..next-1` hold k
  *     samples each"),
  *   - `stco`/`co64` — absolute file offsets of each chunk,
  *   - `mdhd` — the media timescale/duration.
  *
  * Resolving (stsc × stco × stsz) yields every sample's absolute byte
  * range without decoding anything — which is exactly the split a 100 TB
  * video pipeline wants: a cheap metadata pass plans the work (codec,
  * frame count, byte ranges), and the heavy per-frame decode runs
  * per-partition against just the ranges it needs. Codec `jpeg`/`mjpa`
  * (Motion-JPEG in MP4) decodes for REAL with the same `javax.imageio`
  * stack the image path uses; every other codec (`avc1`, `hvc1`, ...)
  * still yields full track metadata and per-sample ranges, with the
  * per-partition ffmpeg seam documented on [[Multimodal]] unchanged.
  *
  * All parsing is bounds-checked and returns empty on truncated or
  * non-BMFF bytes — corrupt cells degrade to the stub path, never to a
  * task-killing exception.
  */
object Mp4 {

  /** One track's metadata, assembled from tkhd/mdhd/hdlr/stsd/stsz. */
  final case class Mp4Track(trackId: Long, handler: String, codec: String,
                            width: Int, height: Int, timescale: Long,
                            duration: Long, nSamples: Int)

  private def u16(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xFF) << 8) | (b(at + 1) & 0xFF)
  private def u32(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xFFL) << 24) | ((b(at + 1) & 0xFFL) << 16) |
      ((b(at + 2) & 0xFFL) << 8) | (b(at + 3) & 0xFFL)
  private def u64(b: Array[Byte], at: Int): Long =
    (u32(b, at) << 32) | u32(b, at + 4)
  private def fourcc(b: Array[Byte], at: Int): String =
    new String(b, at, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Walk the direct children of `[start, end)`, calling `f(type, payload
    * start, payload end)`. Handles 64-bit `largesize` (size == 1) and
    * to-end-of-file boxes (size == 0); stops at the first malformed box. */
  private def walkBoxes(b: Array[Byte], start: Long, end: Long)
                       (f: (String, Long, Long) => Unit): Unit = {
    var p = start
    while (p + 8 <= end) {
      val size0 = u32(b, p.toInt)
      val typ = fourcc(b, p.toInt + 4)
      val (dataStart, boxEnd) =
        if (size0 == 1 && p + 16 <= end) (p + 16, p + u64(b, p.toInt + 8))
        else if (size0 == 0) (p + 8, end)
        else (p + 8, p + size0)
      if (boxEnd < dataStart || boxEnd > end) return // truncated: stop
      f(typ, dataStart, boxEnd)
      p = boxEnd
    }
  }

  private def isBmff(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 4) == "ftyp"

  /** Find the first child box of `typ` under `[start, end)`. */
  private def child(b: Array[Byte], start: Long, end: Long, typ: String): Option[(Long, Long)] = {
    var found: Option[(Long, Long)] = None
    walkBoxes(b, start, end) { (t, s, e) => if (t == typ && found.isEmpty) found = Some((s, e)) }
    found
  }

  private def path(b: Array[Byte], start: Long, end: Long, typs: String*): Option[(Long, Long)] =
    typs.foldLeft(Option((start, end))) {
      case (Some((s, e)), t) => child(b, s, e, t)
      case (None, _)         => None
    }

  /** All tracks' metadata; Nil when the bytes aren't ISO-BMFF. */
  def tracks(b: Array[Byte]): Seq[Mp4Track] = {
    if (!isBmff(b)) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
    for ((ms, me) <- child(b, 0, b.length.toLong, "moov")) {
      walkBoxes(b, ms, me) { (t, ts, te) =>
        if (t == "trak") {
          val trackId = child(b, ts, te, "tkhd").map { case (s, _) =>
            val v = b(s.toInt) & 0xFF
            if (v == 1) u32(b, s.toInt + 20) else u32(b, s.toInt + 12)
          }.getOrElse(0L)
          val mdia = child(b, ts, te, "mdia")
          val (timescale, duration) = mdia.flatMap { case (s, e) =>
            child(b, s, e, "mdhd")
          }.map { case (s, _) =>
            val v = b(s.toInt) & 0xFF
            if (v == 1) (u32(b, s.toInt + 20), u64(b, s.toInt + 24))
            else (u32(b, s.toInt + 12), u32(b, s.toInt + 16))
          }.getOrElse((0L, 0L))
          val handler = mdia.flatMap { case (s, e) => child(b, s, e, "hdlr") }
            .map { case (s, _) => fourcc(b, s.toInt + 8) }.getOrElse("")
          val stbl = mdia.flatMap { case (s, e) => path(b, s, e, "minf", "stbl") }
          val (codec, w, h) = stbl.flatMap { case (s, e) => child(b, s, e, "stsd") }
            .filter { case (s, e) => e - s >= 16 && u32(b, s.toInt + 4) >= 1 }
            .map { case (s, _) =>
              val entry = s.toInt + 8 // version/flags + entry_count
              val cc = fourcc(b, entry + 4)
              // VisualSampleEntry: width/height at +32/+34 from entry start
              if (handler == "vide") (cc, u16(b, entry + 32), u16(b, entry + 34))
              else (cc, 0, 0)
            }.getOrElse(("", 0, 0))
          val nSamples = stbl.flatMap { case (s, e) => child(b, s, e, "stsz") }
            .map { case (s, _) => u32(b, s.toInt + 8).toInt }.getOrElse(0)
          out += Mp4Track(trackId, handler, codec, w, h, timescale, duration, nSamples)
        }
      }
    }
    out.toSeq
  }

  /** The first video track's per-sample absolute byte ranges, resolved
    * from stsc × stco/co64 × stsz — the planning pass: no frame bytes are
    * touched, so this is cheap even when the samples are h264. Returns
    * (offset, size) in sample order; Nil on non-BMFF / missing tables. */
  def videoSampleRanges(b: Array[Byte]): Seq[(Long, Long)] = {
    if (!isBmff(b)) return Nil
    val stblOpt = (for {
      (ms, me) <- child(b, 0, b.length.toLong, "moov").iterator
      trak <- { val ts = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
                walkBoxes(b, ms, me) { (t, s, e) => if (t == "trak") ts += ((s, e)) }
                ts.iterator }
      (mdS, mdE) <- child(b, trak._1, trak._2, "mdia").iterator
      if child(b, mdS, mdE, "hdlr").exists { case (s, _) => fourcc(b, s.toInt + 8) == "vide" }
      stbl <- path(b, mdS, mdE, "minf", "stbl").iterator
    } yield stbl).nextOption()
    stblOpt.toSeq.flatMap { case (ss, se) =>
      val sizes: IndexedSeq[Long] = child(b, ss, se, "stsz").toIndexedSeq.flatMap { case (s, _) =>
        val uniform = u32(b, s.toInt + 4)
        val n = u32(b, s.toInt + 8).toInt
        if (uniform != 0) IndexedSeq.fill(n)(uniform)
        else (0 until n).map(i => u32(b, s.toInt + 12 + 4 * i))
      }
      val chunkOffsets: IndexedSeq[Long] =
        child(b, ss, se, "stco").toIndexedSeq.flatMap { case (s, _) =>
          val n = u32(b, s.toInt + 4).toInt
          (0 until n).map(i => u32(b, s.toInt + 8 + 4 * i))
        } ++
        child(b, ss, se, "co64").toIndexedSeq.flatMap { case (s, _) =>
          val n = u32(b, s.toInt + 4).toInt
          (0 until n).map(i => u64(b, s.toInt + 8 + 8 * i))
        }
      val stscRuns: IndexedSeq[(Long, Long)] = // (first_chunk, samples_per_chunk)
        child(b, ss, se, "stsc").toIndexedSeq.flatMap { case (s, _) =>
          val n = u32(b, s.toInt + 4).toInt
          (0 until n).map(i => (u32(b, s.toInt + 8 + 12 * i), u32(b, s.toInt + 12 + 12 * i)))
        }
      if (sizes.isEmpty || chunkOffsets.isEmpty || stscRuns.isEmpty) Nil
      else {
        val ranges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var sample = 0
        var run = 0
        for (chunk1 <- 1 to chunkOffsets.length if sample < sizes.length) {
          while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk1) run += 1
          val spc = stscRuns(run)._2.toInt
          var off = chunkOffsets(chunk1 - 1)
          var i = 0
          while (i < spc && sample < sizes.length) {
            ranges += ((off, sizes(sample)))
            off += sizes(sample)
            sample += 1; i += 1
          }
        }
        ranges.toSeq
      }
    }
  }

  /** REAL frame extraction for Motion-JPEG in MP4 (codec fourcc `jpeg` /
    * `mjpa`): each video sample is a complete JPEG. Returns the raw JPEG
    * frames in sample order; Nil when the video codec isn't MJPEG (the
    * metadata and sample ranges above still work — only the decode needs
    * the ffmpeg seam). */
  def mjpegMp4Frames(b: Array[Byte]): Seq[Array[Byte]] = {
    val video = tracks(b).find(_.handler == "vide")
    if (!video.exists(t => t.codec == "jpeg" || t.codec == "mjpa")) return Nil
    videoSampleRanges(b).flatMap { case (off, size) =>
      val s = off.toInt; val e = (off + size).toInt
      if (s >= 0 && e <= b.length && size >= 2 &&
          b(s) == 0xFF.toByte && b(s + 1) == 0xD8.toByte)
        Some(java.util.Arrays.copyOfRange(b, s, e))
      else None
    }
  }
}
