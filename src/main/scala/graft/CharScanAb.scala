package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-JVM A/B of the native CharScan counters against the regex/split
  * renderings they replaced (`functions/TextScan.scala`) — the same
  * controlled methodology as round 8's DotProduct proof: one session,
  * page cache warmed once, both arms warmed untimed, then the timed
  * passes INTERLEAVED (A,B,A,B,…) so host-neighbour drift lands on both
  * arms equally; per-arm median of 3. The two arms are first checked
  * value-equal (the identities TextScanSpec property-pins), so the
  * comparison times identical work.
  *
  * Both arms run the `x_quality` + `x_token_count` projection shapes —
  * every counter the document-stats queries use — over the documents
  * table of `SPARK_GRAFT_SF_DIR`, aggregated to one row so collect cost
  * is nil and the timing is pure scan+count.
  *
  * Prints one JSON line:
  * `{"metric":"charscan_ab","native":N,"regex":M,"speedup":M/N,...}`. */
object CharScanAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextScan

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t = col("text")

    // native arm: the four single-pass byte counters
    def native(df: DataFrame): DataFrame = df.select(
      sum(TextScan.spaces(t) + lit(1)).as("space_tokens"),
      sum(TextScan.punct(t)).as("punct"),
      sum(TextScan.wsRuns(trim(t)) + lit(1)).as("ws_tokens"),
      sum(TextScan.bpeTokens(t)).as("bpe_tokens"))
    // regex arm: the composable renderings they replaced (verbatim from
    // TextScanSpec's reference expressions)
    def regex(df: DataFrame): DataFrame = df.select(
      sum(size(split(t, " "))).as("space_tokens"),
      sum(size(regexp_extract_all(t, lit("[^A-Za-z0-9 ]"), lit(0)))).as("punct"),
      sum(size(split(trim(t), "\\s+"))).as("ws_tokens"),
      sum(size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))).as("bpe_tokens"))

    // value equality first — a fast wrong arm would be a meaningless win
    val nv = native(docs).collect().head.toSeq
    val rv = regex(docs).collect().head.toSeq
    require(nv == rv, s"arms disagree: native=$nv regex=$rv")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both arms untimed (codegen compile, page cache), then interleave
    native(docs).collect(); regex(docs).collect()
    val (na, ra) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (_ <- 1 to 3) {
      na += time(native(docs).collect())
      ra += time(regex(docs).collect())
    }
    def median(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
    val (n, r) = (median(na.result()), median(ra.result()))
    println(f"""{"metric":"charscan_ab","unit":"sec","native":$n%.3f,"regex":$r%.3f,"speedup":${r / n}%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
