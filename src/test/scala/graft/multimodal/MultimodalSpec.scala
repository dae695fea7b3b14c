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

  test("frame sampling: k rows per video, embeddings differ per frame") {
    import spark.implicits._
    val ds = Seq(media(7, "video", "movie", frames = 5)).toDS()
    val frames = sampleFrames(ds, 3).collect()
    assert(frames.length == 3)
    val embs = frames.map(_.getSeq[Float](3))
    assert(embs.distinct.length == 3)
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
