package graft
import org.apache.spark.sql.functions._
object N3Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scratch/sf1")
    val spark = graft.runtime.GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.QueryPack.n3Segments(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"full: ${(System.nanoTime()-t0)/1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString.split("\n").filter(l =>
      l.contains("Aggregate") || l.contains("Exchange") || l.contains("Sort") ||
      l.contains("Window") || l.contains("Scan")).mkString("\n"))
    spark.stop()
  }
}
