package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-18 optimization-phase stage profiler: attributes the expensive
  * composite rows' wall-clock to their internal stages, so optimization
  * effort lands where the time actually goes (guide §1: measure first).
  * Each phase is forced through the noop sink, run once untimed (warm)
  * then `SPARK_GRAFT_RUNS` timed (default 2, min reported). Prints one
  * JSON line. args(0) = documents dir (default /root/testdata/sf0.1). */
object R18Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = ProbeSession.local()
    import graft.operators.{TextDedup, TextStats, TextPipeline}

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.format("noop").mode("overwrite").save() // page-cache warm

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    def timed(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(s"r18probe: $name")
      try f catch { case e: Throwable =>
        System.err.println(s"[r18probe] $name warmup failed: ${e.getMessage}")
        results(name) = -1.0; return
      }
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      results(name) = ts.min
      System.err.println(f"[r18probe] $name%-28s ${ts.min}%.3f s")
      spark.sparkContext.setJobDescription(null)
    }

    val training = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val lexicon = Seq("zebra", "slow")

    // --- pipeline stage pieces (x_pipeline_e2e anatomy) ---
    val gated = training.filter(
      round(graft.functions.GopherScan.gopherScan(col("text"), "\n")
        .getField("top_2gram_char_frac"), 4) <= 0.20 &&
      graft.functions.LexiconScan.lexiconScan(col("text"), lexicon)
        .getField("n_hits") === 0)
    timed("gates")(force(gated))
    import org.apache.spark.sql.expressions.Window
    def dedupOf(df: DataFrame): DataFrame = df
      .withColumn("_fp", md5(col("text")))
      .withColumn("_rn",
        row_number().over(Window.partitionBy(col("_fp")).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1).drop("_fp", "_rn")
    timed("gates+dedup")(force(dedupOf(gated)))
    val deduped = dedupOf(gated)
    timed("decontaminate n=10")(force(
      TextDedup.decontaminate(deduped, "doc_id", "text", bench, "text", n = 10)))
    timed("calibrate+temp")(force {
      val clean = deduped
      val calibrated = TextStats.calibrateByStratum(
          clean.withColumn("_q", TextStats.quality(col("text"))),
          "lang", col("_q"), "doc_id")
        .filter(col("q_rank") >= 0.1)
      TextStats.applyTemperature(calibrated, "lang", "doc_id", 0.5)
    })
    timed("pack+shard")(force {
      val packed = TextStats.packSequences(deduped, "lang", "doc_id",
        TextStats.spaceTokens(col("text")).cast("long"), 2000)
      TextStats.shuffleShards(packed, "doc_id", 8, "42")
    })
    timed("e2e full")(force(TextPipeline.e2e(
      training, "doc_id", "text", "lang", bench, "text", lexicon = lexicon)))

    // --- near-dup stage anatomy (x_pipeline_near minus e2e) ---
    val n = deduped.count()
    val bits = 4 * TextDedup.simhashWidthFor(n)
    timed("simhash sig")(force(
      TextDedup.simhash(deduped, "doc_id", "text", bits, wideHash = true)))
    timed("simhash pairs")(force(
      TextDedup.simhashPairs(deduped, "doc_id", "text", bits, wideHash = true)))
    val pairs = TextDedup.simhashPairs(deduped, "doc_id", "text", bits,
      wideHash = true).localCheckpoint()
    timed("connected components")(force(
      TextDedup.connectedComponents(pairs, "doc_id_a", "doc_id_b")))
    timed("e2e near full")(force(TextPipeline.e2e(
      training, "doc_id", "text", "lang", bench, "text", lexicon = lexicon,
      nearDedup = true)))

    // --- tokenized pipeline anatomy ---
    var model: TextStats.BpeModel = null
    timed("bpe train")({ model = TextStats.bpeTrain(docs, "text", 16) })
    timed("e2e tok full")(force(TextPipeline.e2eTokenized(
      training, "doc_id", "text", "lang", bench, "text", lexicon = lexicon,
      model = model)))

    // --- quality training anatomy ---
    timed("qtrain full")({
      val (w, b) = TextStats.trainQualityModel(
        docs, "doc_id", "text", col("lang") === "en",
        buckets = 256, iters = 4, lr = 0.5)
      force(TextStats.learnedQuality(docs, "doc_id", "text", w.toSeq, b))
    })

    val line = results.map { case (k, v) => s"\"$k\":$v" }
      .mkString(s"""{"sf":"$sfDir","stages":{""", ",", "}}")
    println(line)
    spark.stop()
  }
}
