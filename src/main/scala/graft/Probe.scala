package graft

import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.runtime.GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("scratch/sf10/documents.parquet")
    def time(name: String)(f: => Any): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    time("scan only") { docs.agg(sum(length(col("text")))).collect() }
    time("explode count") { toks.agg(count(lit(1))).collect() }
    time("tf shuffle") { toks.groupBy("term", "doc_id").agg(count(lit(1))).agg(count(lit(1))).collect() }
    time("full termStats") {
      graft.operators.Retrieval.termStats(docs, "doc_id", "text").agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
