package graft

/** BPE training engine A/B — the measurement behind the speculative
  * round engine ([[graft.operators.TextStats.bpeTrain]] scaladoc and
  * SCALING.md x_bpe_train): times the merge-per-job sequential engine
  * against the simulate-and-verify batch engine on the same corpus and
  * prints the committed-trajectory equality check plus Spark job counts
  * (the serialization dimension the r12 verdict flagged: K sequential
  * jobs is unusable at a production tokenizer's K≈32k).
  *
  * args: docsDir (default scratch/sf10), K (default 256),
  * specBatch (default 16), engines (default "both" | "spec" | "seq"),
  * sampleWords (default 4096 — the engine default takes the driver-exact
  * path on this 31-word corpus; pass e.g. 16 to force the distributed
  * speculative engine with a genuinely partial sample).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scratch/sf10")
    val k = args.lift(1).map(_.toInt).getOrElse(256)
    val specBatch = args.lift(2).map(_.toInt).getOrElse(16)
    val engines = args.lift(3).getOrElse("both")
    val sampleWords = args.lift(4).map(_.toInt).getOrElse(4096)
    val spark = graft.runtime.GraftSession.builder(
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sc = spark.sparkContext

    def run(name: String)(f: => graft.operators.TextStats.BpeModel): graft.operators.TextStats.BpeModel = {
      val jobs0 = sc.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      val m = f
      val secs = (System.nanoTime() - t0) / 1e9
      val jobs = sc.statusTracker.getJobIdsForGroup(null).length - jobs0
      println(f"$name%-22s K=$k merges=${m.merges.size} jobs=$jobs time=$secs%.2f s")
      m
    }

    val spec =
      if (engines != "seq")
        Some(run(s"speculative(M=$specBatch,V=$sampleWords)") {
          graft.operators.TextStats.bpeTrain(docs, "text", k,
            specBatch = specBatch, sampleWords = sampleWords)
        })
      else None
    val seq =
      if (engines != "spec")
        Some(run("sequential") {
          graft.operators.TextStats.bpeTrainSequential(docs, "text", k)
        })
      else None
    for (a <- spec; b <- seq)
      println(s"trajectory equal: ${a == b}")
    spark.stop()
  }
}
