package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-truncation policy for iterative operators.
  *
  * Iterative plans (connected components, IVF index builds) must cut their
  * lineage every round or the plan tree grows with the loop. Two policies:
  *
  *   - `None` → `localCheckpoint()`: blocks live in executor-local storage.
  *     Fast (no replication, no filesystem round-trip) — the right default
  *     on a single machine — but on a real cluster an executor loss
  *     mid-loop loses blocks that can no longer be recomputed, killing the
  *     job.
  *   - `Some(dir)` → reliable `checkpoint()` into `dir` (HDFS / object
  *     store): survives executor loss, the right choice for long loops at
  *     cluster scale. The caller owns the directory's lifecycle; each
  *     operator invocation writes under a fresh UUID subdirectory (Spark's
  *     `setCheckpointDir` contract).
  */
object Checkpoints {

  /** Returns the checkpoint function for `dir`, setting the session's
    * checkpoint directory once when a reliable dir is requested. */
  def policy(spark: SparkSession, dir: Option[String]): DataFrame => DataFrame =
    dir match {
      case Some(d) =>
        spark.sparkContext.setCheckpointDir(d)
        df => df.checkpoint()
      case None =>
        df => df.localCheckpoint()
    }
}
