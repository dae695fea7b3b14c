package graft.streaming

import graft.compile.MappingCompiler
import graft.model.TableMapping
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface.
  *
  * The reference is a lazy single-pass pipeline, so its semantics lift
  * naturally onto unbounded input: the compiled mapping projection is
  * stateless/narrow and applies to a streaming DataFrame unchanged. What
  * needs genuine streaming machinery is the ORDERED operators — and those
  * map onto watermarks + windows + keyed state:
  *
  *   - header skip (T3) is per-file and static → handled at read time;
  *     footer skip (T2) needs file-completeness and is inherently batch —
  *     documented unsupported on streams (the reference, reading complete
  *     files, has no streaming equivalent either);
  *   - tumbling/sliding aggregation over event time with late-data
  *     tolerance via `withWatermark`;
  *   - record segmentation / sessionization (N3's streaming analogue) via
  *     `flatMapGroupsWithState` with processing-time timeouts.
  */
object Streams {

  /** Apply a compiled mapping to a STREAMING line source. `linesDf` must
    * carry (file, lineno, cells) — e.g. `spark.readStream.text` through the
    * same parsers as the batch path. Narrow: safe on unbounded input. */
  def records(linesDf: DataFrame, mapping: TableMapping): DataFrame = {
    require(mapping.footerLines == 0,
      "footer_lines needs file-completeness; not supported on streams")
    val data = if (mapping.headerLines > 0)
      linesDf.filter(col("lineno") >= mapping.headerLines) else linesDf
    MappingCompiler(mapping).records(data)
  }

  /** Tumbling event-time aggregation with a watermark: count + exact sum
    * per (window, key). Late rows beyond the watermark are dropped —
    * the streaming contract for the batch `agg_stream_tumbling` shape. */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     window: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
               col(keyCol))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))

  final case class Event(userId: Long, tsMs: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)
  final case class Session(userId: Long, startMs: Long, endMs: Long,
                           nEvents: Int, total: Double)

  /** Gap-based sessionization with keyed state (the N3 segmentation state
    * machine on an unbounded stream): a session closes when no event
    * arrives within `gapMs`. Emits closed sessions. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.tsMs)
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            cur match {
              case Some(st) if e.tsMs - st.last > gapMs =>
                closed += Session(userId, st.start, st.last, st.n, st.total)
                cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
              case Some(st) =>
                cur = Some(st.copy(last = e.tsMs, n = st.n + 1,
                  total = st.total + e.value))
              case None =>
                cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Streaming exact deduplication — the unbounded-input rendering of the
    * batch content-hash dedup: documents are keyed by `md5(text)` and
    * duplicates arriving within the event-time watermark are dropped.
    * `dropDuplicatesWithinWatermark` prunes the hash state as the watermark
    * advances, so state stays bounded by the dedup horizon rather than
    * growing with the stream — the only shape that survives an unbounded
    * 100 TB/day feed. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** File-stream ingestion of delimited data through the mapping pipeline:
    * the streaming twin of the batch Importer's csv path. Headers are
    * consumed by the csv reader; a per-file line ORDINAL does not exist on
    * an unbounded stream (and `monotonically_increasing_id` is rejected on
    * streaming plans), so `lineno`/`index` carry a surrogate id built from
    * `(task partition << 40) | position-within-partition` — UNIQUE within
    * a file even for byte-identical rows (a file is ingested atomically in
    * one micro-batch, and a file's partitions are distinct within it), and
    * stable across task retries (file splits replay in the same order).
    * The id is NOT contiguous; mappings needing a stable business key
    * should still prefer `row_identifier: uuid`. */
  def delimitedStream(spark: SparkSession, dir: String, mapping: TableMapping): DataFrame = {
    // the csv reader can consume exactly one header line per file; deeper
    // headers (and per-file header VALIDATION, which needs the whole
    // header block) are batch-path features — fail loudly, not silently
    require(mapping.headerLines <= 1,
      s"header_lines=${mapping.headerLines}: streams support at most one " +
        "header line (use the batch Importer for multi-line headers)")
    val sep = mapping.delimiter.getOrElse(",")
    val schema = org.apache.spark.sql.types.StructType(
      mapping.columns.indices.map(i =>
        org.apache.spark.sql.types.StructField(s"c$i",
          org.apache.spark.sql.types.StringType)))
    val lines = spark.readStream
      .option("sep", sep).schema(schema)
      .option("header", mapping.headerLines > 0)
      .csv(dir)
    val cells = array(mapping.columns.indices.map(i => col(s"c$i")): _*)
    val withFileCells = lines.select(
      input_file_name().as("file"), cells.as("cells"))
    val outSchema = org.apache.spark.sql.types.StructType(
      withFileCells.schema.fields :+
        org.apache.spark.sql.types.StructField("lineno",
          org.apache.spark.sql.types.LongType))
    val withId = withFileCells.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var pos = -1L
      it.map { r =>
        pos += 1
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ ((pid << 40) | pos))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    MappingCompiler(mapping).records(withId)
  }
}
