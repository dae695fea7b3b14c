package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import Multimodal._

  private def media(id: Long, kind: String, seed: String,
                    w: Int = 4, h: Int = 4, frames: Int = 3) =
    MediaRow(id, kind, seed.getBytes("UTF-8"), MediaMeta("fake", w, h, frames, 0))

  test("image features: deterministic, one row per image, embedding unit-norm") {
    import spark.implicits._
    val ds = Seq(media(1, "image", "img-one"), media(2, "image", "img-two"),
                 media(3, "video", "vid")).toDS()
    val feats = imageFeatures(ds).collect().sortBy(_.docId)
    assert(feats.map(_.docId).toSeq == Seq(1L, 2L))
    val again = imageFeatures(ds).collect().sortBy(_.docId)
    assert(feats.map(_.meanLuma).toSeq == again.map(_.meanLuma).toSeq)
    val norm = math.sqrt(feats.head.embedding.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  /** A real w×h PNG/JPEG: left half black, right half white. */
  private def realImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("real PNG decode: actual dimensions and Rec.601 mean luma from pixels") {
    import spark.implicits._
    val png = realImage(8, 4, "png")
    val ds = Seq(MediaRow(1, "image", png, MediaMeta("png", 0, 0, 0, 0))).toDS()
    val f = imageFeatures(ds).collect().head
    // dimensions come from the raster, not the (zeroed) metadata
    assert(f.width == 8 && f.height == 4)
    // half black (0), half white (255) → mean luma 127.5 exactly
    assert(math.abs(f.meanLuma - 127.5) < 1e-9, s"luma ${f.meanLuma}")
  }

  test("real JPEG decode: dimensions exact, luma within lossy tolerance") {
    import spark.implicits._
    val jpg = realImage(16, 16, "jpg")
    val ds = Seq(MediaRow(2, "image", jpg, MediaMeta("jpg", 0, 0, 0, 0))).toDS()
    val f = imageFeatures(ds).collect().head
    assert(f.width == 16 && f.height == 16)
    assert(math.abs(f.meanLuma - 127.5) < 10.0, s"luma ${f.meanLuma}")
  }

  test("resize: decodable image re-rasterised to the target size") {
    import spark.implicits._
    val png = realImage(8, 8, "png")
    val ds = Seq(MediaRow(3, "image", png, MediaMeta("png", 8, 8, 0, 0))).toDS()
    val out = resize(ds, 4, 2).collect().head
    assert(out.meta.width == 4 && out.meta.height == 2)
    val (w, h, _) = Multimodal.decodeImage(out.bytes).get
    assert(w == 4 && h == 2, "re-encoded bytes must decode at the new size")
    // undecodable bytes: metadata-only passthrough, bytes untouched
    val fake = media(4, "image", "not-an-image")
    val out2 = resize(Seq(fake).toDS(), 2, 2).collect().head
    assert(out2.bytes.toSeq == fake.bytes.toSeq && out2.meta.width == 2)
  }

  test("frame sampling: k rows per video, embeddings differ per frame") {
    import spark.implicits._
    val ds = Seq(media(7, "video", "movie", frames = 5)).toDS()
    val frames = sampleFrames(ds, 3).collect()
    assert(frames.length == 3)
    val embs = frames.map(_.getSeq[Float](3))
    assert(embs.distinct.length == 3)
  }

  /** A minimal MJPEG AVI: RIFF("AVI ") → LIST("movi") → one 00dc chunk
    * per JPEG frame (word-aligned), exactly the layout the RIFF walk
    * reads. Frames are REAL JPEGs encoded via ImageIO. */
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val movi = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("movi".getBytes("ISO-8859-1"))
      frames.foreach { f =>
        b.write("00dc".getBytes("ISO-8859-1")); b.write(le32(f.length)); b.write(f)
        if (f.length % 2 == 1) b.write(0) // word alignment
      }
      b.toByteArray
    }
    val inner = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("AVI ".getBytes("ISO-8859-1"))
      b.write("LIST".getBytes("ISO-8859-1")); b.write(le32(movi.length)); b.write(movi)
      b.toByteArray
    }
    bos.write("RIFF".getBytes("ISO-8859-1")); bos.write(le32(inner.length)); bos.write(inner)
    bos.toByteArray
  }

  test("real MJPEG-AVI decode: actual JPEG frames out, evenly sampled") {
    import spark.implicits._
    // 5 distinguishable frames (increasing brightness)
    val jpegs = (0 until 5).map { i =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val v = 40 * i
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", b)
      b.toByteArray
    }
    val avi = mjpegAvi(jpegs)
    assert(mjpegAviFrames(avi).map(_.toSeq) == jpegs.map(_.toSeq),
      "all frames recovered byte-exact, in order")

    val ds = Seq(MediaRow(9, "video", avi, MediaMeta("avi", 8, 8, 5, 0))).toDS()
    val sampled = sampleFrames(ds, 2).collect().sortBy(_.getInt(1))
    assert(sampled.length == 2)
    // sampled rows carry the REAL jpeg byte sizes (frames 0 and 2 of 5)
    assert(sampled.map(_.getInt(2)).toSeq == Seq(jpegs(0).length, jpegs(2).length))
    // and each sampled frame still decodes as an image
    assert(Multimodal.decodeImage(jpegs(0)).get._1 == 8)
    // non-AVI bytes fall back to the stub (same schema, k rows)
    val stub = sampleFrames(Seq(media(10, "video", "not-avi", frames = 4)).toDS(), 3)
    assert(stub.collect().length == 3)
  }

  test("real WAV decode: sample rate, frames and RMS from actual PCM") {
    import javax.sound.sampled._
    import spark.implicits._
    // 0.5 s of a full-scale-/2 sine at 440 Hz, 8 kHz mono PCM16 →
    // RMS = 0.5/sqrt(2) ≈ 0.3536
    val rate = 8000
    val n = rate / 2
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (0.5 * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
      pcm(i * 2) = (v & 0xFF).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val ds = Seq(MediaRow(7, "audio", wav, MediaMeta("wav", 0, 0, 0, 0))).toDS()
    val f = audioFeatures(ds).collect().head
    assert(f.sampleRateHz == rate && f.channels == 1 && f.nFrames == n)
    assert(math.abs(f.durationSec - 0.5) < 1e-9)
    assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 1e-3, s"rms=${f.rms}")
    // undecodable bytes fall back to the deterministic stub
    val stub = audioFeatures(Seq(media(8, "audio", "noise")).toDS()).collect().head
    assert(stub.docId == 8 && stub.rms >= 0.0 && stub.rms <= 1.0)
  }

  test("binary columns survive a parquet round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mm").toString + "/media"
    val ds = Seq(media(1, "image", "img-one")).toDS()
    withMediaColumns(ds.toDF(), "bytes").write.parquet(dir)
    val back = spark.read.parquet(dir)
    val row = back.selectExpr("docId", "media_md5", "media_size", "bytes").collect().head
    assert(row.getLong(0) == 1L)
    assert(row.getAs[Array[Byte]]("bytes").toSeq == "img-one".getBytes("UTF-8").toSeq)
    assert(row.getInt(2) == 7)
  }
}
