package graft.runtime

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Progress notification (T11 — reference `table.rb:53,60,80`
  * `notifier.started / processed(i) / finished`).
  *
  * The reference notifies per row from a single thread; on a cluster the
  * honest equivalent is per-task-batch granularity: a SparkListener
  * accumulates output-row counts as tasks finish and invokes the callback
  * on the driver. `record_total` (T13, the reference's `wc -l` subprocess)
  * is a cheap `count()` on columnar sources, exposed as [[recordTotal]].
  */
final class Notifier(spark: SparkSession)(onProgress: Long => Unit) {

  private val processed = new AtomicLong(0)
  @volatile private var active = false

  private val listener = new SparkListener {
    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      if (active && taskEnd.taskMetrics != null) {
        val n = taskEnd.taskMetrics.outputMetrics.recordsWritten
        if (n > 0) onProgress(processed.addAndGet(n))
      }
    }
  }

  def started(): Unit = {
    processed.set(0)
    active = true
    spark.sparkContext.addSparkListener(listener)
  }

  def finished(): Long = {
    active = false
    spark.sparkContext.removeSparkListener(listener)
    processed.get()
  }

  /** T13 — record-total estimate; trivially cheap on parquet (footer
    * statistics), a single pass elsewhere. */
  def recordTotal(df: org.apache.spark.sql.DataFrame): Long = df.count()
}
