package graft

import org.apache.spark.sql.DataFrame

/** The near-dup ingest gate's MISSING bench point — round-16 verdict
  * task 1b: `x_near_ingest`'s only timing was a contended end-of-round
  * snapshot, and that number also conflated the index build (priced
  * once per refresh) with the probe side (priced per micro-batch).
  * This probe times the two halves separately, matching the gate's
  * deployment shape:
  *
  *   - `build_sec`: [[graft.operators.TextDedup.simhashIndexBuckets]]
  *     over the corpus + `localCheckpoint()` — the ONE exchange the
  *     design prices per index refresh (includes the width-sizing
  *     `count()`).
  *   - `probe_*`: [[graft.streaming.Streams.nearDropAtIngest]] of the
  *     full corpus against the prebuilt index, noop-forced — the
  *     shuffle-free stream-side cost, warmup + median of 3.
  *   - `merge_sec`: [[graft.operators.TextDedup.simhashIndexMerge]] of
  *     a 10% batch into a 90% index (both freshly built, the merge
  *     itself timed alone) — the incremental-refresh alternative to
  *     `build_sec`, which only signs the batch and shuffles
  *     index-sized bytes, never re-reading the indexed corpus text.
  *
  * Prints one JSON line. */
object NearIngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = ProbeSession.local()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.format("noop").mode("overwrite").save() // page-cache warm

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)

    val (built, buildSec) = time {
      val n = docs.count()
      val bits = 4 * graft.operators.TextDedup.simhashWidthFor(n)
      val idx = graft.operators.TextDedup
        .simhashIndexBuckets(docs, "doc_id", "text", bits, wideHash = true)
        .localCheckpoint()
      (n, bits, idx)
    }
    val (rows, bits, index) = built

    def probe(): Unit = force(graft.streaming.Streams
      .nearDropAtIngest(docs, "doc_id", "text", index, bits, wideHash = true))
    val (_, warm) = time(probe())
    val probeTimes = (1 to 3).map(_ => time(probe())._2)
    val pMed = median(probeTimes)

    // incremental refresh: 90% pre-indexed (untimed), the 10% batch
    // merged in (timed: batch sign + index-bytes shuffle + checkpoint)
    val base = graft.operators.TextDedup
      .simhashIndexBuckets(docs.filter(org.apache.spark.sql.functions
        .col("doc_id") % 10 =!= 0), "doc_id", "text", bits, wideHash = true)
      .localCheckpoint()
    val (_, mergeSec) = time(graft.operators.TextDedup
      .simhashIndexMerge(base, docs.filter(org.apache.spark.sql.functions
        .col("doc_id") % 10 === 0), "doc_id", "text", bits, wideHash = true)
      .localCheckpoint())

    val ts = probeTimes.map(t => f"$t%.3f").mkString("[", ",", "]")
    println(f"""{"metric":"near_ingest_probe","unit":"sec","rows":$rows,"bits":$bits,"build_sec":$buildSec%.3f,"merge10pct_sec":$mergeSec%.3f,"probe_warmup_sec":$warm%.3f,"probe_times_sec":$ts,"probe_median_sec":$pMed%.3f,"probe_rows_per_sec":${rows / pMed}%.0f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
