package graft.runtime

import graft.SparkSpec

class NotifierSpec extends SparkSpec {
  test("notifier accumulates task progress and recordTotal counts") {
    import spark.implicits._
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val n = new Notifier(spark)(p => seen.synchronized { seen += p })
    n.started()
    val df = (1 to 1000).toDF("x").repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("notif").toString + "/out"
    df.write.parquet(dir)
    // listener delivery is async; poll briefly for the counts to land
    val deadline = System.currentTimeMillis() + 10000
    while (seen.synchronized(seen.lastOption).getOrElse(0L) < 1000L &&
           System.currentTimeMillis() < deadline) Thread.sleep(50)
    val total = n.finished()
    assert(total == 1000L)
    assert(seen.nonEmpty)
    assert(n.recordTotal(spark.read.parquet(dir)) == 1000L)
  }
}
