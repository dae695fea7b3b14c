package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages shaped for a 100 TB training-data pipeline.
  *
  * The Spark-side plumbing is real and tested: binary columns ride
  * Parquet/Tungsten as-is; per-batch processing uses `mapPartitions` over
  * typed Datasets (the JVM twin of `mapInPandas` — one iterator per
  * partition, so heavyweight codec state is initialised once per task, not
  * per row); partitioning is by file/row-group so codec work never
  * shuffles.
  *
  * IMAGE decode is REAL: PNG/JPEG/GIF/BMP via `javax.imageio` (ships in
  * the JDK) — actual pixel dimensions and Rec. 601 mean luma. AUDIO decode
  * is REAL for PCM WAV/AIFF/AU via `javax.sound.sampled` (also JDK) —
  * actual sample rate, frame count and RMS amplitude. VIDEO decode is REAL
  * for MJPEG in both common containers — AVI (`mjpegAviFrames`: RIFF chunk
  * walk) and MP4 ([[Mp4]]: ISO-BMFF box walk + stsc×stco×stsz sample-table
  * resolution) — with per-frame JPEG via imageio; for other codecs the MP4
  * METADATA pass is still real (codec fourcc, coded dimensions, timescale,
  * per-sample byte ranges — the planning half of a 100 TB video pipeline)
  * while the decode falls back to a deterministic content-hash STUB, the
  * permanent extension point where a deployment drops an ffmpeg binding
  * into the per-partition codec context without touching the Spark
  * plumbing. Embeddings are likewise content-hash stubs (a real pipeline
  * calls a model here).
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int,
                             nFrames: Int, sampleRateHz: Int)
  final case class MediaRow(docId: Long, kind: String, bytes: Array[Byte],
                            meta: MediaMeta)
  final case class ImageFeatures(docId: Long, width: Int, height: Int,
                                 meanLuma: Double, embedding: Array[Float])

  /** REAL image decode via javax.imageio: pixel dimensions and Rec. 601
    * mean luma (0.299 R + 0.587 G + 0.114 B) from the actual raster.
    * Returns None when the bytes aren't a decodable image (corrupt file,
    * or a format ImageIO lacks a reader for). */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
            0.114 * (rgb & 0xFF)
          x += 1
        }
        y += 1
      }
      Some((w, h, sum / (w.toLong * h)))
    }
  }

  /** STUB fallback — fake pixels deterministically from the content hash,
    * used only when bytes aren't a decodable image (synthetic fixtures). */
  def decodeImageStub(bytes: Array[Byte], meta: MediaMeta): Array[Byte] = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val n = math.max(1, meta.width * meta.height)
    Array.tabulate(math.min(n, 4096))(i => h(i % 16))
  }

  final case class AudioFeatures(docId: Long, sampleRateHz: Int, channels: Int,
                                 nFrames: Long, durationSec: Double, rms: Double)

  /** REAL audio decode via javax.sound.sampled (ships in the JDK):
    * sample rate, channels, frame count and RMS amplitude from the actual
    * PCM samples (16-bit signed, either endianness). Returns None for
    * bytes the JDK can't decode (no WAV/AIFF/AU header, or a compressed
    * codec) — those fall back to the deterministic stub. */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long, Double)] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16) { in.close(); None }
      else {
        val data = in.readAllBytes()
        in.close()
        // headers may carry the unknown-length sentinel (-1); the decoded
        // byte count always gives the true frame count
        val frames =
          if (in.getFrameLength >= 0) in.getFrameLength
          else if (fmt.getFrameSize > 0) data.length.toLong / fmt.getFrameSize
          else 0L
        var sumSq = 0.0
        var n = 0
        var i = 0
        while (i + 1 < data.length) {
          val s =
            if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
            else ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
          val v = s / 32768.0
          sumSq += v * v
          n += 1
          i += 2
        }
        Some((fmt.getSampleRate.toInt, fmt.getChannels, frames,
          if (n == 0) 0.0 else math.sqrt(sumSq / n)))
      }
    } catch { case _: Exception => None }
  }

  /** Audio feature extraction: one decode context per partition. Decodable
    * PCM audio gets REAL rate/frames/RMS; other bytes fall back to the
    * content-hash stub (rate from metadata, pseudo-RMS). */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "audio").map { r =>
        decodeAudio(r.bytes) match {
          case Some((rate, ch, frames, rms)) =>
            AudioFeatures(r.docId, rate, ch, frames,
              if (rate == 0) 0.0 else frames.toDouble / rate, rms)
          case None =>
            val h = java.security.MessageDigest.getInstance("MD5").digest(r.bytes)
            AudioFeatures(r.docId, r.meta.sampleRateHz, 1, r.bytes.length.toLong,
              if (r.meta.sampleRateHz == 0) 0.0
              else r.bytes.length.toDouble / r.meta.sampleRateHz,
              (h(0) & 0xFF) / 255.0)
        }
      }
    }
  }

  /** 64-bit audio perceptual hash — the [[imageDHash]] formulation
    * (Krawetz dHash) applied to the mono energy ENVELOPE: decode the
    * PCM, mix channels down, area-average the squared samples into 65
    * time slots spanning the whole clip, and set bit `i` when slot `i`
    * holds more energy than slot `i+1`. Comparisons are monotone in
    * the energy, so the hash is invariant to volume scaling, and the
    * duration-proportional slots make it invariant to sample rate —
    * the same clip resampled or re-gained hashes close (small hamming,
    * from quantisation at slot edges), while different material's
    * envelope gradients are uncorrelated (expected hamming 32, the
    * property [[graft.operators.TextDedup.bandedHammingPairs]]'s
    * banding exploits). None for bytes the JDK can't decode. */
  def audioDHash(bytes: Array[Byte]): Option[Long] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16) { in.close(); None }
      else {
        val data = in.readAllBytes()
        in.close()
        val ch = math.max(1, fmt.getChannels)
        val n = data.length / (2 * ch) // mono frames
        if (n < 2) None
        else {
          val mono = new Array[Double](n)
          var f = 0
          while (f < n) {
            var s = 0.0
            var c = 0
            while (c < ch) {
              val i = (f * ch + c) * 2
              val v =
                if (fmt.isBigEndian) ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
                else ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
              s += v / 32768.0
              c += 1
            }
            mono(f) = s / ch
            f += 1
          }
          val slots = new Array[Double](65)
          var k = 0
          while (k < 65) {
            val s0 = (k.toLong * n / 65).toInt
            val s1 = math.max(s0 + 1, ((k + 1).toLong * n / 65).toInt)
            var sum = 0.0
            var i = s0
            while (i < s1) { sum += mono(i) * mono(i); i += 1 }
            slots(k) = sum / (s1 - s0)
            k += 1
          }
          var hash = 0L
          var b = 0
          while (b < 64) {
            if (slots(b) > slots(b + 1)) hash |= 1L << b
            b += 1
          }
          Some(hash)
        }
      }
    } catch { case _: Exception => None }
  }

  /** Per-clip 64-bit perceptual hash column — the audio leg of the
    * near-dup triad (text simhash, image dHash, THIS): feed straight
    * into [[graft.operators.TextDedup.bandedHammingPairs]] (64 bits,
    * 4 bands, maxHamming ≤ 3 exact by pigeonhole). Undecodable bytes
    * fall back to the deterministic md5 stub hash ([[imagePHashes]]'s
    * contract: uniform, so stubs pair only with byte-identical twins).
    * Narrow mapPartitions, zero shuffle. */
  def audioPHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "audio").map { r =>
        val h = audioDHash(r.bytes).getOrElse {
          val md = java.security.MessageDigest.getInstance("MD5").digest(r.bytes)
          java.nio.ByteBuffer.wrap(md).getLong
        }
        (r.docId, h)
      }
    }.toDF("doc_id", "phash")
  }

  /** Engine-side twin of [[audioDHash]]'s slot-comparison loop for
    * envelope SLOTS-AS-ROWS inputs (and for the cross-engine oracle,
    * which pins the envelope→bit derivation in SQL): per id, pivot the
    * `bits + 1` slot energies into primitive aggregation buffers (one
    * codegen'd hash aggregate — the exchange carries (doc, 65 doubles),
    * never samples) and set bit `b` iff slot `b` holds more energy than
    * slot `b + 1`. The REAL path ([[audioPHashes]]) needs no aggregate at
    * all — a clip's PCM arrives in one MediaRow and the envelope is
    * computed in-row; this shape exists so the derivation is
    * SQL-pinnable, exactly the [[videoSignatureFromFrames]] caveat. */
  def envelopeSignatureFromSlots(slots: DataFrame, idCol: String,
                                 slotCol: String, energyCol: String,
                                 bits: Int = 64): DataFrame = {
    require(bits >= 1 && bits <= 64, s"bits must be 1..64, got $bits")
    val es = (0 to bits).map(k =>
      max(when(col(slotCol) === k, col(energyCol))).as(s"_e$k"))
    val sig = (0 until bits).map(b =>
      when(col(s"_e$b") > col(s"_e${b + 1}"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    slots.groupBy(col(idCol))
      .agg(es.head, es.tail: _*)
      .select(col(idCol), sig.as("ahash"))
  }

  /** STUB — sample k frames from a "video": returns k pseudo-frames. */
  def sampleFramesStub(bytes: Array[Byte], meta: MediaMeta, k: Int): Seq[Array[Byte]] =
    (0 until math.min(k, math.max(1, meta.nFrames))).map { i =>
      decodeImageStub(bytes :+ i.toByte, meta)
    }

  /** REAL video frame extraction for the one format the bare JVM can
    * handle end-to-end: MJPEG inside an AVI container. An AVI is a RIFF
    * tree; video frames live in `..dc`/`..db` chunks under the `movi`
    * LIST, and for MJPEG each such chunk is a complete JPEG (decodable
    * with the same `javax.imageio` stack the image path uses). Returns
    * the raw JPEG frames in stream order, or Nil when the bytes aren't a
    * RIFF/AVI or carry no JPEG frames — callers fall back to the stub,
    * which doubles as the documented extension seam for every other
    * codec (an ffmpeg binding drops in per partition without touching
    * the Spark plumbing). */
  def mjpegAviFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def fourcc(at: Int) = new String(bytes, at, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    def u32(at: Int): Long =
      java.nio.ByteBuffer.wrap(bytes, at, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // real AVIs nest 2-3 LIST levels; the cap turns a crafted/corrupt file
    // with thousands of nested LIST headers into a truncated parse instead
    // of a task-killing StackOverflowError
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 16) return
      var p = start
      while (p + 8 <= end) {
        val id = fourcc(p)
        val size = u32(p + 4)
        val dataStart = p + 8
        val dataEnd = dataStart + size
        if (dataEnd > end || size < 0) return // truncated/corrupt chunk: stop
        if (id == "RIFF" || id == "LIST") {
          if (size >= 4) walk(dataStart + 4, dataEnd.toInt, depth + 1)
        } else if ((id.endsWith("dc") || id.endsWith("db")) && size >= 2 &&
                   bytes(dataStart) == 0xFF.toByte && bytes(dataStart + 1) == 0xD8.toByte) {
          out += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd.toInt)
        }
        p = (dataEnd + (size & 1)).toInt // chunks are word-aligned
      }
    }
    walk(12, math.min(bytes.length.toLong, 8 + u32(4)).toInt, 0)
    out.toSeq
  }

  /** Deterministic pseudo-embedding from content (unit-normalised). */
  def embedStub(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val raw = Array.tabulate(dim)(i => ((md((i * 3) % 16) & 0xFF) - 128) / 128.0f)
    val norm = math.sqrt(raw.map(x => x * x).sum).toFloat
    raw.map(x => if (norm == 0) 0f else x / norm)
  }

  /** Feature extraction over a typed Dataset of media rows: one decode
    * context per partition (mapPartitions), never per row. Decodable
    * images (PNG/JPEG/...) get REAL dimensions and mean luma from their
    * pixels; undecodable bytes fall back to the deterministic stub so
    * synthetic pipelines stay runnable end-to-end. */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE in a real codec (thread-local
      // decoder, model session, etc.); ImageIO's reader registry is
      // JVM-static, so there is nothing further to initialise per task
      rows.filter(_.kind == "image").map { r =>
        decodeImage(r.bytes) match {
          case Some((w, h, luma)) =>
            ImageFeatures(r.docId, w, h, luma, embedStub(r.bytes))
          case None =>
            val px = decodeImageStub(r.bytes, r.meta)
            val luma = if (px.isEmpty) 0.0 else px.map(b => (b & 0xFF).toDouble).sum / px.length
            ImageFeatures(r.docId, r.meta.width, r.meta.height, luma, embedStub(r.bytes))
        }
      }
    }
  }

  /** Resize stage — REAL for decodable images (scaled raster re-encoded
    * as PNG via ImageIO, headless-safe), metadata-only passthrough for
    * everything else. A narrow, shuffle-free media pipeline stage. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val scaled: Option[Array[Byte]] =
        if (r.kind != "image") None
        else try {
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes)))
            .map { img =>
              val out = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              bos.toByteArray
            }
        } catch { case _: Exception => None }
      scaled match {
        case Some(b) => r.copy(bytes = b,
          meta = r.meta.copy(format = "png", width = w, height = h))
        case None => r.copy(meta = r.meta.copy(width = w, height = h))
      }
    }
  }

  /** Frame sampling for video rows → one output row per sampled frame.
    * MJPEG is decoded for REAL from both containers the bare JVM can
    * walk — AVI (RIFF chunks) and MP4 (ISO-BMFF sample tables, [[Mp4]]) —
    * as k evenly-spaced JPEG frames; every other codec falls back to the
    * deterministic stub — the documented extension point for an ffmpeg
    * binding. */
  def sampleFrames(media: Dataset[MediaRow], k: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap { r =>
        val avi = mjpegAviFrames(r.bytes)
        val real = if (avi.nonEmpty) avi else Mp4.mjpegMp4Frames(r.bytes)
        val frames =
          if (real.isEmpty) sampleFramesStub(r.bytes, r.meta, k)
          else if (real.length <= k) real
          else (0 until k).map(i => real((i.toLong * real.length / k).toInt))
        frames.zipWithIndex.map { case (f, i) =>
          (r.docId, i, f.length, embedStub(f))
        }
      }.toDF("doc_id", "frame", "n_bytes", "embedding")
  }

  /** 64-bit difference hash (dHash) of a decodable image: luma is
    * area-averaged onto a 9×8 grid (each cell averages its exact pixel
    * rectangle — deterministic arithmetic, no Graphics2D interpolation
    * whose kernels vary by platform), then bit (row·8 + col) is set iff
    * cell (row, col) is brighter than its right neighbour. Horizontal
    * gradients survive uniform brightness/contrast shifts and re-encoding,
    * so perceptual near-dups land within a few bits of hamming distance —
    * the property [[TextDedup.bandedHammingPairs]]'s banding exploits.
    * None when the bytes aren't a decodable image.
    *
    * Public formulation: the widely documented dHash (Krawetz,
    * hackerfactor.com "Kind of Like That", 2013). */
  def imageDHash(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) None
    else {
      val (gw, gh) = (9, 8)
      val w = img.getWidth
      val h = img.getHeight
      val cell = Array.ofDim[Double](gh, gw)
      var gy = 0
      while (gy < gh) {
        val y0 = (gy.toLong * h / gh).toInt
        val y1 = math.max(y0 + 1, ((gy + 1).toLong * h / gh).toInt)
        var gx = 0
        while (gx < gw) {
          val x0 = (gx.toLong * w / gw).toInt
          val x1 = math.max(x0 + 1, ((gx + 1).toLong * w / gw).toInt)
          var sum = 0.0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
                0.114 * (rgb & 0xFF)
              x += 1
            }
            y += 1
          }
          cell(gy)(gx) = sum / ((y1 - y0).toLong * (x1 - x0))
          gx += 1
        }
        gy += 1
      }
      var hash = 0L
      var r = 0
      while (r < gh) {
        var c = 0
        while (c < 8) {
          if (cell(r)(c) > cell(r)(c + 1)) hash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      Some(hash)
    }
  }

  /** Per-image 64-bit perceptual hash column — the detect half of image
    * dedup: feed the result straight into
    * [[graft.operators.TextDedup.bandedHammingPairs]] (64 bits, 4 bands,
    * maxHamming ≤ 3 exact by pigeonhole) for banded near-dup pairs, never
    * an all-pairs join. Decodable images get the REAL [[imageDHash]];
    * undecodable bytes fall back to a deterministic md5-derived stub hash
    * (synthetic fixtures stay runnable; stub hashes are uniform, so they
    * pair only with byte-identical twins — hamming 0 — never spuriously).
    * Narrow mapPartitions, zero shuffle; one decode context per task. */
  def imagePHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "image").map { r =>
        val h = imageDHash(r.bytes).getOrElse {
          val md = java.security.MessageDigest.getInstance("MD5").digest(r.bytes)
          java.nio.ByteBuffer.wrap(md).getLong
        }
        (r.docId, h)
      }
    }.toDF("doc_id", "phash")
  }

  /** Attach media as a binary column + metadata struct to a DataFrame —
    * the canonical storage shape (binary survives Parquet unchanged). */
  def withMediaColumns(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("media_md5", md5(col(bytesCol)))
      .withColumn("media_size", length(col(bytesCol)))

  /** Per-bit MAJORITY combine of a video's frame hashes into ONE 64-bit
    * temporal signature: bit k is set iff strictly more than half the
    * frames set it (ties → 0). Transient per-frame noise — a re-encoded
    * frame, a dropped frame, a scene insert — flips any given bit in a
    * minority of frames and VANISHES; content that persists across the
    * clip survives, so near-dup videos land within a few bits, exactly
    * the property [[graft.operators.TextDedup.bandedHammingPairs]]'s
    * banding exploits (the same machinery the image and audio rows
    * price). Row-local: a video's frames arrive in one MediaRow, so the
    * combine needs NO aggregate, NO shuffle. */
  def videoTemporalHash(frameHashes: Seq[Long], bits: Int = 64): Long = {
    val n = frameHashes.length
    var sig = 0L
    var k = 0
    while (k < bits) {
      var cnt = 0
      frameHashes.foreach { h => if (((h >> k) & 1L) == 1L) cnt += 1 }
      if (2 * cnt > n) sig |= 1L << k
      k += 1
    }
    sig
  }

  /** Engine-side twin of [[videoTemporalHash]] for per-(doc, frame) hash
    * FRAMES-AS-ROWS inputs (and for the cross-engine oracle, which pins
    * the majority rule in SQL): one hash aggregate with `bits` bounded
    * conditional sums — the exchange carries (doc, 64 longs), never the
    * frames. Parity with the row-local combine is property-pinned in
    * MultimodalSpec. */
  def videoSignatureFromFrames(frames: DataFrame, idCol: String,
                               hashCol: String, bits: Int = 64): DataFrame = {
    require(bits >= 1 && bits <= 64, s"bits must be 1..64, got $bits")
    val sums = (0 until bits).map(k =>
      sum(shiftright(col(hashCol), k).bitwiseAND(lit(1L))).as(s"_b$k"))
    val sig = (0 until bits).map(k =>
      when(lit(2L) * col(s"_b$k") > col("_n"), lit(1L << k)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    frames.groupBy(col(idCol))
      .agg(count(lit(1)).as("_n"), sums: _*)
      .select(col(idCol), sig.as("vhash"))
  }

  /** Video perceptual hash — the detect half of video dedup, completing
    * the text/image/audio/video near-dup quartet on the SAME banded
    * machinery: decode ≤ `k` evenly-spaced frames (real MJPEG from AVI
    * or MP4 containers, [[mjpegAviFrames]]/[[Mp4.mjpegMp4Frames]]; the
    * deterministic stub otherwise — the documented ffmpeg seam), dHash
    * each frame ([[imageDHash]], md5-stub for undecodable frames), and
    * majority-combine IN-ROW ([[videoTemporalHash]]). Narrow
    * mapPartitions, zero shuffle; feed straight into
    * `bandedHammingPairs(…, bits = 64, bands = 4, maxHamming = 3)`. */
  def videoPHashes(media: Dataset[MediaRow], k: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "video").map { r =>
        val avi = mjpegAviFrames(r.bytes)
        val real = if (avi.nonEmpty) avi else Mp4.mjpegMp4Frames(r.bytes)
        val frames =
          if (real.isEmpty) sampleFramesStub(r.bytes, r.meta, k)
          else if (real.length <= k) real
          else (0 until k).map(i => real((i.toLong * real.length / k).toInt))
        val hashes = frames.map { f =>
          imageDHash(f).getOrElse {
            val md = java.security.MessageDigest.getInstance("MD5").digest(f)
            java.nio.ByteBuffer.wrap(md).getLong
          }
        }
        (r.docId, videoTemporalHash(hashes.toSeq))
      }
    }.toDF("doc_id", "vhash")
  }
}
