package graft

import org.apache.spark.sql.SparkSession

/** The probe mains' shared local SparkSession — one place for the
  * measurement configuration every performance probe (NearIngestProbe,
  * UniEncAb, TokProbe, SemDropProbe, BpeEncAb) must agree on, so two
  * probes' numbers are comparable by construction and the next probe
  * cannot drift a config silently:
  *
  *   - `local[$SPARK_GRAFT_CPUS]` (default: all processors) with
  *     shuffle partitions = cpus — the bench convention, NOT the 200
  *     default, so shuffle-stage task counts match the machine.
  *   - AQE on, 64 MB broadcast threshold: the same planner the
  *     headline Bench runs with — a probe that measured under a
  *     different planner would adopt/refute renderings Bench never
  *     executes.
  *   - UTC + UI off + WARN logs: determinism and quiet stdout (probes
  *     print ONE JSON line; the driver tail-parses it). */
object ProbeSession {
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
