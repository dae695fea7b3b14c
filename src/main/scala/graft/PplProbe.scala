package graft

import org.apache.spark.sql.functions._

/** Exact vs hashed-bucket bigram-LM A/B — the measurement behind
  * [[graft.operators.TextStats.bigramLogProbHashed]] (r12 verdict task 6
  * / r13 task 5): times both scorers and both bucketing compositions on
  * the same corpus and reports the tier-assignment agreement, the
  * adopt/reject criterion (SCALING.md records the outcome).
  *
  * args: docsDir (default scratch/sf10), lmBuckets (default 2^21).
  */
object PplProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scratch/sf10")
    val buckets = args.lift(1).map(_.toInt).getOrElse(1 << 21)
    val spark = graft.runtime.GraftSession.builder(
      master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (_ <- 1 to 2) {
      time("lm exact") {
        graft.operators.TextStats.bigramLogProb(docs, "doc_id", "text")
          .agg(count(lit(1))).collect()
      }
      time(s"lm hashed(B=$buckets)") {
        graft.operators.TextStats.bigramLogProbHashed(docs, "doc_id", "text", buckets)
          .agg(count(lit(1))).collect()
      }
      time("tiers exact") {
        graft.operators.TextStats.perplexityBuckets(docs, "doc_id", "text", "lang")
          .agg(count(lit(1))).collect()
      }
      time("tiers hashed") {
        graft.operators.TextStats.perplexityBuckets(docs, "doc_id", "text", "lang",
          hashedLmBuckets = Some(buckets)).agg(count(lit(1))).collect()
      }
    }
    val a = graft.operators.TextStats.perplexityBuckets(docs, "doc_id", "text", "lang")
      .select(col("doc_id"), col("bucket").as("b_exact"))
    val b = graft.operators.TextStats.perplexityBuckets(docs, "doc_id", "text", "lang",
        hashedLmBuckets = Some(buckets))
      .select(col("doc_id"), col("bucket").as("b_hash"))
    val agg = a.join(b, "doc_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("b_exact") === col("b_hash"), 1L).otherwise(0L)).as("same"))
      .collect()(0)
    println(s"tier agreement: ${agg.getLong(1)}/${agg.getLong(0)} = " +
      f"${agg.getLong(1).toDouble / agg.getLong(0) * 100}%.3f%%")
    spark.stop()
  }
}
