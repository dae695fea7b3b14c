package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The PRODUCTION-VOCAB tokenizer point — round-14 verdict task 2: the
  * claim that [[graft.functions.BpeSegment]]/[[graft.functions.UnigramLattice]]
  * keep generated code O(1) in vocabulary size (plan-literal tables via
  * `addReferenceObj`, vs the replace-chain rendering whose generated
  * code grows with K and hits the janino ceiling) was inferred from the
  * r12 K-wide-distance-table observation, never MEASURED at K≈32k.
  *
  * Measures, on `SPARK_GRAFT_SF_DIR`'s documents table:
  *   - `bpeTrain` at K = SPARK_GRAFT_BPE_K (default 32768). On the
  *     scratch corpora the merge space EXHAUSTS below 32k (sf10: 3100
  *     distinct words × ≤10 merges each ≈ 31k possible merges), so the
  *     probe reports the ACHIEVED merge count alongside the time — the
  *     trainer must run the full trajectory to find exhaustion.
  *   - `bpeEncode` with the trained (production-sized) model.
  *   - `unigramLmTrain` at vocabMulti = SPARK_GRAFT_UNI_V (default
  *     32768, capped by available multi-char pieces) + `unigramLmEncode`.
  * Encode passes are noop-forced, median of 3 (training runs once —
  * it IS the measurement; a 32k trajectory is minutes, not noise).
  *
  * Prints one JSON line with achieved sizes and seconds. */
object TokProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scratch/sf1")
    val kReq = sys.env.getOrElse("SPARK_GRAFT_BPE_K", "32768").toInt
    val vReq = sys.env.getOrElse("SPARK_GRAFT_UNI_V", "32768").toInt
    val spark = ProbeSession.local()
    import graft.operators.TextStats

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.format("noop").mode("overwrite").save() // page-cache warm

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)

    val (bpe, tTrain) = time(TextStats.bpeTrain(docs, "text", kReq))
    val (_, w0) = time(force(TextStats.bpeEncode(docs, "doc_id", "text", bpe)))
    val encTimes = (1 to 3).map(_ =>
      time(force(TextStats.bpeEncode(docs, "doc_id", "text", bpe)))._2)
    // The scratch corpora EXHAUST their merge space far below 32k (310 /
    // 3100 distinct short words), so the production-TABLE-size claim —
    // generated code stays O(1) because the merge table and vocab ride
    // addReferenceObj / broadcast, never the plan — is probed by PADDING
    // the trained model to kReq with never-matching synthetic merges:
    // the encode pays the full 32k-entry table (rank map, vocab ids)
    // while the per-word work stays the real corpus's.
    val padBpe = bpe.copy(merges = bpe.merges ++
      (bpe.merges.length until kReq).map(i => (s"pad$i", s"pad$i", 1L)))
    val (_, pw0) = time(force(TextStats.bpeEncode(docs, "doc_id", "text", padBpe)))
    val padTimes = (1 to 3).map(_ =>
      time(force(TextStats.bpeEncode(docs, "doc_id", "text", padBpe)))._2)

    val (uni, tUTrain) = time(TextStats.unigramLmTrain(docs, "text",
      vocabMulti = vReq, seedMulti = 2 * vReq, maxPieceLen = 4))
    val (_, uw0) = time(force(TextStats.unigramLmEncode(docs, "doc_id", "text", uni)))
    val uEncTimes = (1 to 3).map(_ =>
      time(force(TextStats.unigramLmEncode(docs, "doc_id", "text", uni)))._2)
    val padUni = uni.copy(pieces = uni.pieces ++
      // the pad prefix is an EXPLICIT private-use escape, not a raw
      // control byte: pieces must contain a character guaranteed absent
      // from the corpus alphabet so they are strictly never-matching —
      // they inflate only the vocab/log-prob tables, never the lattice.
      // (A bare 'u$i' piece WOULD match in-word 'u'+digit substrings as
      // lattice candidates; Viterbi could never select one at ln 1e-12,
      // but the never-matching claim must hold literally. The first cut
      // used an invisible \u0001 byte, which two source reviews in a row
      // read as plain 'u$i' — hence the visible escape.)
      (uni.pieces.length until vReq).map(i => (s"\uE000u$i", 1e-12)))
    val (_, puw0) = time(force(TextStats.unigramLmEncode(docs, "doc_id", "text", padUni)))
    val padUniTimes = (1 to 3).map(_ =>
      time(force(TextStats.unigramLmEncode(docs, "doc_id", "text", padUni)))._2)

    // e2eTokenized at the production-vocab point — the x_pipeline_tok
    // corpus split, trained model vs the padded-32k model: the in-row
    // VocabId hash probe must stay FLAT in V (it replaced the
    // literal-map rendering THIS probe measured O(V) per lookup).
    def pipeTok(m: TextStats.BpeModel): Double = {
      val df = graft.operators.TextPipeline.e2eTokenized(
        docs.filter(col("doc_id") % 50 =!= 0), "doc_id", "text", "lang",
        docs.filter(col("doc_id") % 50 === 0), "text",
        lexicon = Seq("zebra", "slow"), model = m)
      val t = time(force(df))._2
      graft.operators.TextPipeline.unpersistPipeline(df)
      t
    }
    val pipeW0 = pipeTok(bpe)
    val pipeTimes = (1 to 3).map(_ => pipeTok(bpe))
    val pipePadW0 = pipeTok(padBpe)
    val pipePadTimes = (1 to 3).map(_ => pipeTok(padBpe))

    println(f"""{"metric":"tok_probe","unit":"sec","k_req":$kReq,"k_achieved":${bpe.merges.length},"bpe_train":$tTrain%.1f,"bpe_encode_warm":${median(encTimes)}%.3f,"bpe_encode_cold":$w0%.3f,"bpe_encode_pad32k_warm":${median(padTimes)}%.3f,"bpe_encode_pad32k_cold":$pw0%.3f,"v_req":$vReq,"v_achieved":${uni.pieces.length},"uni_train":$tUTrain%.1f,"uni_encode_warm":${median(uEncTimes)}%.3f,"uni_encode_cold":$uw0%.3f,"uni_encode_pad32k_warm":${median(padUniTimes)}%.3f,"uni_encode_pad32k_cold":$puw0%.3f,"pipe_tok_warm":${median(pipeTimes)}%.3f,"pipe_tok_cold":$pipeW0%.3f,"pipe_tok_pad32k_warm":${median(pipePadTimes)}%.3f,"pipe_tok_pad32k_cold":$pipePadW0%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
