package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B for the round-16 watch item: `x_unigram_encode` at sf10 rose
  * 4.01 → 10.75 s between the r14 and r16 campaigns (2.7×, the only
  * riser above the session's 1.7× host-drift band). The rendering
  * changed between those jars (r15 swapped the plan-literal id map for
  * the broadcast vocab join), so the question is drift vs a real
  * regression — and if real, whether the in-row
  * [[graft.functions.VocabId]] hash probe (already in-tree for the
  * tokenized pipeline) beats the join on the EXPLODED shape too.
  *
  * Arms, interleaved A,B,A,B,... (median of 3 each after one warmup
  * pair) so host drift hits both equally:
  *   A: the broadcast-vocab-join rendering (inlined here verbatim —
  *      it WAS `unigramLmEncode` until this probe's sf10 verdict:
  *      12.6 vs 3.2 s, `BENCH_uniencab_r17_sf10.json`).
  *   B: the shipped [[graft.operators.TextStats.unigramLmEncode]]
  *      (id lookup through `VocabId` in the projection, adopted on
  *      that verdict).
  * Both arms are forced through a noop write; one `except` pass pins
  * the two frames row-identical before timing. Prints one JSON line. */
object UniEncAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scratch/sf10")
    val spark = ProbeSession.local()
    import spark.implicits._
    import graft.operators.TextStats

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()
    // the oracle row's exact shape: default training, one OOV doc
    val model = TextStats.unigramLmTrain(docs, "text")
    val withOov = docs.select(col("doc_id"), col("text"))
      .unionAll(Seq((-1L, "zz xx")).toDF("doc_id", "text"))

    def armA(): DataFrame = {
      val vocabDf = model.vocab.toDF("piece", "_vid")
      withOov.select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("word_idx", "_w")))
        .filter(col("_w") =!= "")
        .select(col("doc_id"), col("word_idx"),
          posexplode(graft.functions.UnigramLattice.unigramViterbi(col("_w"),
            model.logProbs, model.maxPieceLen, model.oovLogProb))
            .as(Seq("sym_idx", "piece")))
        .join(broadcast(vocabDf), Seq("piece"), "left")
        .select(col("doc_id"), col("word_idx"), col("sym_idx"), col("piece"),
          coalesce(col("_vid"), lit(-1L)).as("token_id"))
    }
    def armB(): DataFrame =
      TextStats.unigramLmEncode(withOov, "doc_id", "text", model)

    val diff = armA().exceptAll(armB()).count() + armB().exceptAll(armA()).count()
    require(diff == 0, s"arms disagree on $diff rows — A/B void")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)

    val (wa, wb) = (time(force(armA())), time(force(armB())))
    val pairs = (1 to 3).map(_ => (time(force(armA())), time(force(armB()))))
    val (as, bs) = (pairs.map(_._1), pairs.map(_._2))
    val aStr = as.map(t => f"$t%.3f").mkString("[", ",", "]")
    val bStr = bs.map(t => f"$t%.3f").mkString("[", ",", "]")
    println(f"""{"metric":"uni_enc_ab","unit":"sec","join_warm":$wa%.3f,"vocabid_warm":$wb%.3f,"join_times":$aStr,"vocabid_times":$bStr,"join_median":${median(as)}%.3f,"vocabid_median":${median(bs)}%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
