package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-JVM A/B of the standalone [[graft.operators.TextStats.bpeEncode]]
  * rendering (broadcast vocab JOIN) against the plan-literal `map()`
  * lookup `TextPipeline.e2eTokenized` already uses in-pipeline
  * (`element_at(map(...), sym)`) — round-14 verdict task 5: at 11.9 s
  * sf10 the standalone encode is the largest single-operator cost with a
  * known alternative rendering in-tree. Methodology = CharScanAb's: one
  * session, both arms value-checked equal first (aggregate fingerprint),
  * warmed untimed, then timed passes INTERLEAVED (A,B,A,B,…), per-arm
  * median of 3, forced via noop sink so no collect cost.
  *
  * The join arm pays a broadcast build + BHJ probe per symbol row; the
  * map arm pays an O(A+K)-entry generated lookup inside the projection
  * (zero exchange-adjacent stages). K comes from SPARK_GRAFT_BPE_K
  * (default 16 — the x_bpe_encode configuration).
  *
  * Prints one JSON line:
  * `{"metric":"bpe_enc_ab","join":J,"map":M,"speedup":J/M,...}`. */
object BpeEncAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_BPE_K", "16").toInt
    val spark = ProbeSession.local()
    import spark.implicits._
    import graft.operators.TextStats

    def readTable(name: String): DataFrame = {
      val p = s"$sfDir/$name.parquet"
      spark.read.parquet(p)
    }
    val docs = readTable("documents")
    val model = TextStats.bpeTrain(docs, "text", k)
    val withOov = docs.select(col("doc_id"), col("text"))
      .unionAll(Seq((-1L, "zz xx")).toDF("doc_id", "text"))

    // arm A: the shipped rendering — broadcast vocab join
    def joinArm(): DataFrame = TextStats.bpeEncode(withOov, "doc_id", "text", model)
    // arm B: plan-literal map lookup (the e2eTokenized rendering applied
    // to the standalone operator's exact output shape)
    val merges = model.merges.map(m => (m._1, m._2))
    val vocabMap = map(model.vocab.sortBy(_._2)
      .flatMap { case (s, i) => Seq(lit(s), lit(i)) }: _*)
    def mapArm(): DataFrame = withOov
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("word_idx", "_w")))
      .filter(col("_w") =!= "")
      .select(col("doc_id"), col("word_idx"),
        posexplode(graft.functions.BpeSegment.bpeSegment(col("_w"), merges))
          .as(Seq("sym_idx", "_sym")))
      .select(col("doc_id"), col("word_idx"), col("sym_idx"),
        coalesce(element_at(vocabMap, col("_sym")), lit(-1L)).as("token_id"))

    // value equality first — order-free aggregate fingerprint
    def fp(df: DataFrame): Seq[Any] = df.agg(count(lit(1)),
      sum(hash(col("doc_id"), col("word_idx"), col("sym_idx"), col("token_id"))
        .cast("long"))).collect().head.toSeq
    val (fj, fm) = (fp(joinArm()), fp(mapArm()))
    require(fj == fm, s"arms disagree: join=$fj map=$fm")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    force(joinArm()); force(mapArm()) // warm untimed
    val (ja, ma) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (_ <- 1 to 3) {
      ja += time(force(joinArm()))
      ma += time(force(mapArm()))
    }
    def median(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
    val (j, m) = (median(ja.result()), median(ma.result()))
    println(f"""{"metric":"bpe_enc_ab","unit":"sec","k":$k,"join":$j%.3f,"map":$m%.3f,"speedup":${j / m}%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
