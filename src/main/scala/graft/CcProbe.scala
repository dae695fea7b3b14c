package graft

import org.apache.spark.sql.functions._

/** Round-18 fact-finder for the near-dup CC stage at scale: pair count,
  * duplicate-signature factor, per-round CC cost. args(0) = sf dir. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scratch/sf10")
    val spark = ProbeSession.local()
    import graft.operators.{TextDedup, TextStats}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 50 =!= 0)
    import org.apache.spark.sql.expressions.Window
    val gated = docs.filter(
      round(graft.functions.GopherScan.gopherScan(col("text"), "\n")
        .getField("top_2gram_char_frac"), 4) <= 0.20 &&
      graft.functions.LexiconScan.lexiconScan(col("text"), Seq("zebra", "slow"))
        .getField("n_hits") === 0)
    val deduped = gated
      .withColumn("_fp", md5(col("text")))
      .withColumn("_rn",
        row_number().over(Window.partitionBy(col("_fp")).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1).drop("_fp", "_rn")
      .localCheckpoint()
    val n = deduped.count()
    val bits = 4 * TextDedup.simhashWidthFor(n)
    println(s"docs=$n bits=$bits")
    val sig = TextDedup.simhash(deduped, "doc_id", "text", bits, wideHash = true)
      .localCheckpoint()
    val distinctSigs = sig.select(s"simhash$bits").distinct().count()
    println(s"distinct sigs=$distinctSigs (dup factor ${n.toDouble / distinctSigs})")
    val t0 = System.nanoTime()
    val pairs = TextDedup.simhashPairs(deduped, "doc_id", "text", bits,
      wideHash = true).localCheckpoint()
    val nPairs = pairs.count()
    println(f"pairs=$nPairs built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val cc = TextDedup.connectedComponents(pairs, "doc_id_a", "doc_id_b")
    val nNodes = cc.count()
    println(f"cc nodes=$nNodes in ${(System.nanoTime() - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
