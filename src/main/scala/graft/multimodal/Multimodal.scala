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
  * The CODECS are deterministic STUBS, clearly marked: no image/audio
  * library ships in this container. Each stub derives its output from an
  * md5 of the bytes, so pipelines are testable end-to-end and results are
  * stable across runs; a real deployment swaps `decodeImageStub` /
  * `sampleFramesStub` for javax.imageio / ffmpeg bindings without touching
  * any of the Spark plumbing around them.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int,
                             nFrames: Int, sampleRateHz: Int)
  final case class MediaRow(docId: Long, kind: String, bytes: Array[Byte],
                            meta: MediaMeta)
  final case class ImageFeatures(docId: Long, width: Int, height: Int,
                                 meanLuma: Double, embedding: Array[Float])

  /** STUB — "decode" an image: dimensions from metadata, pixels faked
    * deterministically from the content hash. Real impl: javax.imageio. */
  def decodeImageStub(bytes: Array[Byte], meta: MediaMeta): Array[Byte] = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val n = math.max(1, meta.width * meta.height)
    Array.tabulate(math.min(n, 4096))(i => h(i % 16))
  }

  /** STUB — sample k frames from a "video": returns k pseudo-frames. */
  def sampleFramesStub(bytes: Array[Byte], meta: MediaMeta, k: Int): Seq[Array[Byte]] =
    (0 until math.min(k, math.max(1, meta.nFrames))).map { i =>
      decodeImageStub(bytes :+ i.toByte, meta)
    }

  /** Deterministic pseudo-embedding from content (unit-normalised). */
  def embedStub(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val raw = Array.tabulate(dim)(i => ((md((i * 3) % 16) & 0xFF) - 128) / 128.0f)
    val norm = math.sqrt(raw.map(x => x * x).sum).toFloat
    raw.map(x => if (norm == 0) 0f else x / norm)
  }

  /** Feature extraction over a typed Dataset of media rows: one decode
    * context per partition (mapPartitions), never per row. */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE in a real codec (thread-local
      // decoder, model session, etc.)
      rows.filter(_.kind == "image").map { r =>
        val px = decodeImageStub(r.bytes, r.meta)
        val luma = if (px.isEmpty) 0.0 else px.map(b => (b & 0xFF).toDouble).sum / px.length
        ImageFeatures(r.docId, r.meta.width, r.meta.height, luma, embedStub(r.bytes))
      }
    }
  }

  /** Resize stage (stub): metadata-only transform + re-derived pixels —
    * shows the shape of a narrow, shuffle-free media pipeline stage. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }

  /** Frame sampling for video rows → one output row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRow], k: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap { r =>
        sampleFramesStub(r.bytes, r.meta, k).zipWithIndex.map { case (f, i) =>
          (r.docId, i, f.length, embedStub(f))
        }
      }.toDF("doc_id", "frame", "n_bytes", "embedding")
  }

  /** Attach media as a binary column + metadata struct to a DataFrame —
    * the canonical storage shape (binary survives Parquet unchanged). */
  def withMediaColumns(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("media_md5", md5(col(bytesCol)))
      .withColumn("media_size", length(col(bytesCol)))
}
