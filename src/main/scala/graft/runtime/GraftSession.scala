package graft.runtime

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Defaults are chosen for the 100 TB posture (SURVEY.md §7.7): AQE on
  * (runtime re-plan, skew-join splitting, partition coalescing), broadcast
  * threshold generous enough that dimension tables always broadcast, and a
  * shuffle-partition count that callers override per deployment (32 for the
  * local[32] harness, thousands on a real cluster).
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // spill-aware split sizing: partitions sized to fit executor memory
      // comfortably at high SF (default 128m; kept explicit so deployments
      // tune it alongside shuffle.partitions)
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")

  /** Shared local session for tests / tools. */
  lazy val local: SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
