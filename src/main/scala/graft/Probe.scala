package graft

import org.apache.spark.sql.functions._

/** Phase profiler for the retrieval token pipeline — the measurement
  * behind [[graft.functions.TermCounts]]'s scaladoc numbers (and the
  * committed-profiler precedent set by [[CharScanAb]]): each phase is
  * run once untimed (warm) then once timed, so the deltas attribute
  * cost to scan vs explode vs the (term, doc) exchange vs the full
  * operator. args(0) = documents dir (default `scratch/sf10`). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scratch/sf10")
    val spark = graft.runtime.GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Any): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val pre = docs.select(col("doc_id"),
      explode(graft.functions.TermCounts.termCounts(col("text"))).as(Seq("term", "tf")))
    time("scan only") { docs.agg(sum(length(col("text")))).collect() }
    time("explode count") { toks.agg(count(lit(1))).collect() }
    time("term_counts explode count") { pre.agg(count(lit(1))).collect() }
    time("(term,doc) exchange") { toks.groupBy("term", "doc_id").agg(count(lit(1))).agg(count(lit(1))).collect() }
    time("full termStats") {
      graft.operators.Retrieval.termStats(docs, "doc_id", "text").agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
