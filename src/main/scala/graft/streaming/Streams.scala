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

  final case class BandMember(id: Long, sig: Long, tsMs: Long)
  final case class BandBucket(members: List[BandMember])
  final case class NearDupPair(idA: Long, idB: Long, hamming: Int)

  /** Streaming NEAR-duplicate candidate pairs — [[dedupStream]]'s exact
    * fingerprints widened to simhash banding: the unbounded-input
    * rendering of [[graft.operators.TextDedup.simhashPairs]]. Each doc's
    * `bits`-bit signature is computed in-row
    * ([[graft.functions.SimhashScan]] — row-local, so it applies to a
    * stream unchanged), cut into `bands` slices, and each (band, slice)
    * bucket keeps the watermark-recent members as keyed state; an
    * arriving doc is verified by exact hamming distance against its
    * bucket's members and every pair within `maxHamming` is emitted
    * exactly once.
    *
    * Exactly-once across bands WITHOUT a second stateful dedup stage: a
    * colliding pair may share several bands, but every group holds both
    * FULL signatures, so only the smallest matching band index emits
    * (any other matching band sees a smaller one exists and stays
    * silent) — pair-distinctness by local arithmetic, not by a
    * downstream `dropDuplicates` whose state would grow with the pair
    * count.
    *
    * The batch pigeonhole contract carries over (`maxHamming < bands`
    * enforced: a qualifying pair always shares at least one band) WITHIN
    * the watermark horizon: two docs more than `watermarkMs` apart in
    * event time are never paired, and members older than the current
    * watermark are pruned on every bucket visit — state is bounded by
    * the horizon's document count × `bands`, never by the stream's
    * history (the only shape that survives an unbounded feed). Buckets
    * silent past the horizon remove themselves via event-time timeout.
    *
    * StreamsSpec pins batch parity: over a replay whose docs fit inside
    * the horizon, the union of emitted pairs equals
    * `TextDedup.simhashPairs` on the same frame, bit for bit. */
  def nearDupPairsStream(docs: DataFrame, idCol: String, textCol: String,
                         tsCol: String, bits: Int = 16, bands: Int = 4,
                         maxHamming: Int = 3, wideHash: Boolean = false,
                         watermarkMs: Long = 60 * 60 * 1000L): Dataset[NearDupPair] = {
    require(bands > 0 && bits % bands == 0,
      s"bits ($bits) must split evenly into bands ($bands)")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands, got $maxHamming/$bands")
    require(watermarkMs > 0, s"watermarkMs must be positive, got $watermarkMs")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = bits / bands
    val mask = (1L << w) - 1
    def firstMatchingBand(a: Long, b: Long): Int = {
      var bd = 0
      while (bd < bands) {
        if (((a >>> (bd * w)) & mask) == ((b >>> (bd * w)) & mask)) return bd
        bd += 1
      }
      -1
    }
    val slices = (0 until bands).map(b =>
      shiftrightunsigned(col("_sig"), b * w).bitwiseAND(mask))
    val banded = docs
      .withWatermark(tsCol, s"$watermarkMs milliseconds")
      .select(col(idCol).cast("long").as("_id"),
        graft.functions.SimhashScan.simhashScan(col(textCol), bits, wideHash).as("_sig"),
        // a bare alias (no cast) — casting would strip the column's
        // watermark metadata and break the event-time timeout contract
        col(tsCol).as("_ts"))
      .select(col("_id"), col("_sig"), col("_ts"),
        posexplode(array(slices: _*)).as(Seq("_band", "_key")))
      .as[(Long, Long, java.sql.Timestamp, Int, Long)]
    banded
      .groupByKey { case (_, _, _, band, key) => (band, key) }
      .flatMapGroupsWithState[BandBucket, NearDupPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bucket: (Int, Long), rows: Iterator[(Long, Long, java.sql.Timestamp, Int, Long)],
         state: GroupState[BandBucket]) =>
          val horizon = state.getCurrentWatermarkMs()
          val kept = state.getOption.map(_.members).getOrElse(Nil)
            .filter(_.tsMs >= horizon)
          if (!rows.hasNext) { // timeout visit: prune or retire the bucket
            if (kept.isEmpty) state.remove()
            else {
              state.update(BandBucket(kept))
              // a very late member must not arm a timeout at/behind the
              // watermark — Spark rejects it
              state.setTimeoutTimestamp(
                math.max(kept.map(_.tsMs).max + watermarkMs, horizon + 1))
            }
            Iterator.empty
          } else {
            val fresh = rows.map(r => BandMember(r._1, r._2, r._3.getTime))
              .toSeq.sortBy(m => (m.tsMs, m.id))
            val out = Seq.newBuilder[NearDupPair]
            var members = kept
            fresh.foreach { m =>
              members.foreach { c =>
                if (c.id != m.id) {
                  val ham = java.lang.Long.bitCount(c.sig ^ m.sig)
                  if (ham <= maxHamming &&
                      firstMatchingBand(c.sig, m.sig) == bucket._1)
                    out += NearDupPair(math.min(c.id, m.id),
                      math.max(c.id, m.id), ham)
                }
              }
              members = m :: members
            }
            state.update(BandBucket(members))
            state.setTimeoutTimestamp(
              math.max(members.map(_.tsMs).max + watermarkMs, horizon + 1))
            out.result().iterator
          }
      }
  }

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

  /** Semantic drop-at-ingest against a BATCH-BUILT SemDedup index: each
    * arriving embedded document is assigned its nearest centroid
    * (plan-literal, row-local native argmin), LSH-bucketed (plan-literal
    * planes), probed against the packed index
    * ([[graft.operators.Ann.semIndexBuckets]]) with ONE stream-static
    * left equi-join on (cell, bucket), and judged IN-ROW over the
    * bucket's ~64 members — dropped iff some indexed member reaches
    * `cos ≥ tau` (4-dp rounded, [[graft.operators.Ann.semDedup]]'s
    * rounding). One output row per ingested doc: (id, cell, cent_cos,
    * witness, cos_sim, dropped) — witness = highest-cosine member,
    * ties to the smallest id (selected by VALUE via an array_min over
    * (−cos, id) structs, so collect_list's member order never matters).
    *
    * STATELESS by construction — every operator is row-local or a
    * stream-static join, so the query runs in append mode with no
    * watermark and no keyed state; the same DataFrame code runs
    * unchanged on a batch frame (StreamsSpec pins the two bit-equal).
    * Policy note: ingest priority, not [[graft.operators.Ann.semDedup]]'s
    * symmetric greedy — an arriving duplicate always loses to the
    * index, whatever its centroid-cosine; self-ids already present in
    * the index are excluded so re-ingest replays are idempotent.
    *
    * `centroids`/`planes` must fingerprint-match the index's build
    * parameters — ENFORCED against the stamp columns
    * ([[graft.operators.Ann.stampedSemMembers]]): a mismatched probe
    * raises instead of silently mis-keying every bucket lookup.
    *
    * Scale shape: the index is O(corpus) but bucket-PACKED (~64-member
    * rows); the stream side never shuffles — the join is the static
    * side's lookup. Unlike the simhash twin (24 B/member, broadcastable
    * by construction at any corpus size), the members here CARRY the
    * embedding vectors (~4·dim B each), so the probe join has two
    * regimes: under the broadcast threshold it is the BroadcastHashJoin
    * lookup the small-scale plan shows; past it Spark co-partitions
    * both sides on (cell, bucket) — measured at sf10 (index ~105 MB):
    * sort-merge with one exchange per side, 4.2 s for the full 200k
    * probe. Either plan judges in-row over ~64 members; neither is
    * ever all-pairs. If per-batch probing at the co-partitioned scale
    * becomes the measured cost, the amortization path is persisting
    * the refreshed index as a (cell, bucket)-bucketed table
    * ([[graft.runtime.Bucketing]]) so the index-side exchange+sort is
    * priced per refresh instead of per probe. The in-row
    * member scan is two interpreted HOFs over ≤~64 elements around the
    * native dot; if ingest throughput ever makes that the measured
    * bottleneck, the upgrade path is a native best-witness expression
    * (the BpeSegment playbook). */
  def semDropAtIngest(docs: DataFrame, idCol: String, embCol: String,
                      index: DataFrame,
                      centroids: Seq[(Long, Seq[Double])],
                      planes: Seq[Seq[Int]], tau: Double): DataFrame = {
    import graft.operators.Ann
    val spark = docs.sparkSession
    import spark.implicits._
    val cents = broadcast(centroids.toDF("_cent_id", "_cent"))
    Ann.assignCells(docs, embCol, centroids)
      .withColumn("bucket", Ann.lshBucket(col(embCol), planes))
      .withColumn("_nrm", Ann.norm(col(embCol)))
      .join(cents, col("cell") === col("_cent_id"))
      .withColumn("cent_cos", round(
        Ann.dot(col(embCol), col("_cent")) / (col("_nrm") * Ann.norm(col("_cent"))), 4))
      // the stamp guard rides the members read (the simhash gate's
      // pattern): a probe under different centroids/planes than the
      // index was built with raises on the first bucket row instead of
      // silently mis-keying every (cell, bucket) lookup
      .join(index.select(col("cell"), col("bucket"),
          Ann.stampedSemMembers(index, centroids, planes).as("members")),
        Seq("cell", "bucket"), "left")
      .withColumn("_cands", filter(
        transform(col("members"), m => struct(
          (-round(Ann.dot(col(embCol), m.getField("emb")) /
            (col("_nrm") * m.getField("nrm")), 4)).as("ncos"),
          m.getField("id").as("witness"))),
        c => (-c.getField("ncos") >= tau) && c.getField("witness") =!= col(idCol)))
      .withColumn("_best", array_min(col("_cands")))
      .select(col(idCol), col("cell"), col("cent_cos"),
        col("_best.witness").as("witness"),
        (-col("_best.ncos")).as("cos_sim"),
        col("_best").isNotNull.as("dropped"))
  }

  /** Near-duplicate drop-at-ingest against a BATCH-BUILT simhash index
    * ([[graft.operators.TextDedup.simhashIndexBuckets]]) — the
    * [[semDropAtIngest]] pattern applied to the simhash track, and the
    * ingest-side composition of the batch pipeline's near-dup keeper
    * ([[graft.operators.TextPipeline]] stage 2b): each arriving doc
    * computes its signature and 4-dp keeper quality IN-ROW
    * ([[graft.functions.SimhashScan]] + [[graft.operators.TextStats.quality]]
    * — both row-local, so they apply to a stream unchanged), probes its
    * `bands` bucket keys with stream-static LEFT equi-joins against the
    * packed index, and judges the collected members in-row: the doc is
    * DROPPED iff some indexed member within `maxHamming` beats it on
    * (quality desc, id asc) — the keeper window's exact ordering,
    * decided locally. One output row per ingested doc:
    * (id, sig, witness, witness_q, dropped) — witness = the
    * best-quality qualifying member, ties to the smallest id (selected
    * by VALUE via `array_min` over (−q, id) structs, so the index's
    * member packing order never matters).
    *
    * STATELESS by construction — row-local kernels plus `bands`
    * stream-static joins, so the query runs in append mode with no
    * watermark and no keyed state, and the same DataFrame code runs
    * unchanged on a batch frame (StreamsSpec pins the two bit-equal).
    * The pigeonhole contract (`maxHamming < bands`, enforced) makes the
    * banded probe EXACT: every indexed member within `maxHamming`
    * shares at least one band key, so the local decision sees every
    * qualifying witness. Policy note: ingest-local best-witness, not
    * the batch stage's global cluster keeper — on a transitive chain
    * a→b→c where only adjacent docs collide, the batch CC keeper keeps
    * exactly one doc per CLUSTER, while the ingest gate judges each doc
    * against its direct neighbours only (a doc survives iff no indexed
    * near-dup beats it). Self-ids already present in the index are
    * excluded, so re-ingest replays are idempotent.
    *
    * Scale shape: the index is O(corpus × bands) but bucket-packed
    * (size `bits` via [[graft.operators.TextDedup.simhashWidthFor]] to
    * hold populations ~64); the stream side never shuffles — each probe
    * is the static side's lookup, and the in-row judge is linear in the
    * probed buckets' members.
    *
    * `bits`/`bands`/`wideHash` must match the index's build parameters
    * — ENFORCED against the index's stamp columns
    * ([[graft.operators.TextDedup.stampedMembers]]): a mismatched probe
    * raises instead of silently mis-keying every bucket lookup. */
  def nearDropAtIngest(docs: DataFrame, idCol: String, textCol: String,
                       index: DataFrame, bits: Int, bands: Int = 4,
                       maxHamming: Int = 3,
                       wideHash: Boolean = false): DataFrame = {
    import graft.operators.TextStats
    require(bits >= 1 && bits <= 56, s"simhash supports 1..56 bits, got $bits")
    require(bands > 0 && bits % bands == 0,
      s"bits ($bits) must split evenly into bands ($bands)")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands, got $maxHamming/$bands")
    val w = bits / bands
    val mask = (1L << w) - 1
    val memberType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sig",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("q",
          org.apache.spark.sql.types.DoubleType))))
    val withSig = docs
      .withColumn("_id", col(idCol).cast("long"))
      .withColumn("sig",
        graft.functions.SimhashScan.simhashScan(col(textCol), bits, wideHash))
      .withColumn("_q", TextStats.quality(col(textCol)))
    // one stream-static LEFT join per band — a single join would need the
    // probe keys EXPLODED to rows and the verdict re-aggregated per doc,
    // which append mode without watermarks cannot express; `bands` is 4,
    // not corpus-sized, and each join is the static side's lookup
    val probed = (0 until bands).foldLeft(withSig) { (acc, b) =>
      // the stamp guard rides the members read: a probe configured at a
      // different width than the index was built with raises on the
      // first bucket row instead of silently mis-keying every lookup
      // (near-dups would sail through with no error otherwise)
      val bucket = index.filter(col("band") === b)
        .select(col("key").as(s"_k$b"),
          graft.operators.TextDedup
            .stampedMembers(index, bits, bands, wideHash).as(s"_m$b"))
      acc
        .withColumn(s"_key$b",
          shiftrightunsigned(col("sig"), b * w).bitwiseAND(mask))
        .join(bucket, col(s"_key$b") === col(s"_k$b"), "left")
    }
    // concat propagates a null operand to a null result, so each missed
    // bucket coalesces to the empty member list first
    val allMembers = concat((0 until bands).map(b =>
      coalesce(col(s"_m$b"), array().cast(memberType))): _*)
    probed
      .withColumn("_cands", filter(allMembers, m =>
        bit_count(m.getField("sig").bitwiseXOR(col("sig"))) <= maxHamming &&
          m.getField("id") =!= col("_id") &&
          (m.getField("q") > col("_q") ||
            (m.getField("q") === col("_q") && m.getField("id") < col("_id")))))
      .withColumn("_best", array_min(transform(col("_cands"), m =>
        struct((-m.getField("q")).as("nq"), m.getField("id").as("witness")))))
      .select(col(idCol), col("sig"),
        col("_best.witness").as("witness"),
        (-col("_best.nq")).as("witness_q"),
        col("_best").isNotNull.as("dropped"))
  }
}
