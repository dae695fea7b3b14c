package graft.operators

import graft.SparkSpec
import org.apache.spark.GraftListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** The distributed coarse-quantizer Lloyd refinement (round 11): the
  * E-step is the native `NearestCentroid` scan, the M-step a
  * `groupBy(cell)` sort-within-cell mean — and the DRIVER never holds
  * more than the k centroids. Three pins:
  *
  *   1. bit parity with the driver loop it replaced (the small-sample
  *      fast path, `driverSide = true`) — same doubles, element for
  *      element, so every oracle hash downstream is unchanged;
  *   2. driver-bound bytes stay O(k): the task-result bytes of the
  *      distributed path are a fraction of the driver path's (which
  *      collects the whole 32·k-vector sample) — the round-10 verdict's
  *      "no corpus-sized collect" requirement, measured not asserted;
  *   3. the E-step's executed plan carries the native argmin, not an
  *      interpreted HOF or the banned K-wide dot-array expansion. */
class LloydDistributedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"

  test("distributed Lloyd equals the driver loop bit-for-bit (iters 1 and 2)") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val kc = math.ceil(math.sqrt(emb.count().toDouble)).toInt
    for (iters <- Seq(1, 2)) {
      val dist = Ann.centroidsLloyd(emb, "vec_id", "embedding", kc, iters = iters)
      val drv = Ann.centroidsLloyd(emb, "vec_id", "embedding", kc, iters = iters,
        driverSide = true)
      assert(dist == drv,
        s"distributed and driver Lloyd diverged at iters=$iters")
    }
    // the starved configuration must agree across paths too (it is a
    // measured trap, but it must be the SAME trap on both)
    val distStarved = Ann.centroidsLloyd(emb, "vec_id", "embedding", kc,
      iters = 1, sampleN = 256)
    val drvStarved = Ann.centroidsLloyd(emb, "vec_id", "embedding", kc,
      iters = 1, sampleN = 256, driverSide = true)
    assert(distStarved == drvStarved)
  }

  private def measureResultBytes(body: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) acc.addAndGet(m.resultSize)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      GraftListenerBridge.drain(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    acc.get()
  }

  test("the distributed refinement ships O(k) bytes to the driver, not the sample") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val kc = math.ceil(math.sqrt(emb.count().toDouble)).toInt // 45 → sample 1440
    val driverBytes = measureResultBytes {
      Ann.centroidsLloyd(emb, "vec_id", "embedding", kc, iters = 1,
        driverSide = true)
    }
    val distBytes = measureResultBytes {
      Ann.centroidsLloyd(emb, "vec_id", "embedding", kc, iters = 1)
    }
    info(f"task-result bytes: driver-loop path = $driverBytes%d, " +
      f"distributed path = $distBytes%d (${distBytes.toDouble / driverBytes}%.2fx)")
    // the driver path collects 32·k full vectors; the distributed path
    // only the k seeds, the threshold scalar and the k refined means —
    // at 32 members per cell the gap must be wide even after per-task
    // accounting overhead lands on the (more-jobs) distributed side
    assert(distBytes < driverBytes / 2,
      s"distributed Lloyd shipped $distBytes result bytes vs the driver " +
        s"loop's $driverBytes — a corpus-sized collect is back on the path")
  }

  test("the E-step's executed plan runs the native argmin inside the sample scan") {
    val plans = collection.mutable.ArrayBuffer[String]()
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val kc = math.ceil(math.sqrt(emb.count().toDouble)).toInt
      Ann.centroidsLloyd(emb, "vec_id", "embedding", kc, iters = 1)
      GraftListenerBridge.drain(spark.sparkContext)
    } finally spark.listenerManager.unregister(ql)
    val eStep = plans.synchronized { plans.find(_.contains("graft_nearest_centroid")) }
    assert(eStep.isDefined,
      s"no executed plan carried the native argmin — E-step not distributed?\n" +
        plans.synchronized { plans.mkString("\n---\n") })
    assert(!eStep.get.contains("array(graft_dot"),
      s"K-wide dot-array expansion (JIT-ceiling risk) in the E-step:\n${eStep.get}")
  }
}
