package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-truncation policy for iterative operators.
  *
  * Iterative plans (connected components, IVF index builds, LSH band
  * tables) must cut their lineage every round or the plan tree grows with
  * the loop. Two policies:
  *
  *   - `None` → `localCheckpoint()`: blocks live in executor-local
  *     storage. Fast (no filesystem round-trip) — the right default on a
  *     single machine — but on a real cluster an executor loss mid-loop
  *     loses blocks that can no longer be recomputed, killing the job.
  *   - `Some(dir)` → a parquet spill under `dir` (HDFS / object store):
  *     the frame is written once and read back, so it survives executor
  *     loss AND costs exactly one job — unlike `Dataset.checkpoint()`,
  *     which recomputes the plan a second time when writing the checkpoint
  *     files unless the RDD was persisted first, and which mutates the
  *     session-global `SparkContext.setCheckpointDir` (a second operator
  *     with a different directory would silently redirect the first one's
  *     rounds). Each call writes a fresh UUID subdirectory; the caller
  *     owns `dir`'s lifecycle and deletes it when the derived results are
  *     no longer needed.
  */
object Checkpoints {

  /** Returns the checkpoint function for `dir`. */
  def policy(spark: SparkSession, dir: Option[String]): DataFrame => DataFrame =
    dir match {
      case Some(d) => df => spill(spark, d, df)
      case None    => df => df.localCheckpoint()
    }

  /** A checkpointer for ITERATIVE loops that deletes each superseded
    * round's spill once the next round is durably written, so a 50-round
    * loop holds at most two spills in `dir` instead of fifty. With `dir`
    * None the same discipline applies to `localCheckpoint` blocks: the
    * superseded round's pinned blocks are unpersisted EAGERLY as soon as
    * the new round's checkpoint returns (waiting on driver GC + the
    * ContextCleaner would pin K copies across a K-round loop). Never
    * releases the most recent checkpoint — the loop's final result reads
    * from it.
    *
    * CONTRACT, both branches: a superseded round's frame has truncated
    * lineage AND deleted/unpersisted storage, so any late re-read of it
    * fails hard ("Checkpoint block not found" / missing spill files)
    * instead of recomputing. Each round must therefore derive only from
    * the immediately preceding `apply` result; never hold a reference to
    * an earlier round's frame past the next roll. Single-threaded use
    * (one per loop), like the loops that own it. */
  final class Rolling(spark: SparkSession, dir: Option[String]) {
    private var last: Option[String] = None
    private var lastLocal: Option[DataFrame] = None
    def apply(df: DataFrame): DataFrame = dir match {
      case Some(d) =>
        val path = s"${d.stripSuffix("/")}/ckpt-${java.util.UUID.randomUUID()}"
        val out = spillTo(spark, path, df)
        last.foreach(delete(spark, _))
        last = Some(path)
        out
      case None =>
        // localCheckpoint() is eager: by the time it returns, the new
        // round's blocks are pinned, so the PREVIOUS round's blocks can be
        // released deterministically instead of waiting on driver GC +
        // ContextCleaner — a K-round loop would otherwise pin K copies in
        // MEMORY_AND_DISK (mirrors the Some branch's delete of the prior
        // spill). Never unpersists the most recent checkpoint: the loop's
        // final result reads from it.
        val out = df.localCheckpoint()
        lastLocal.foreach(releaseLocal)
        lastLocal = Some(out)
        out
    }
  }

  /** Frees a superseded `localCheckpoint()`'s pinned blocks. The blocks
    * live on the checkpointed internal RDD, NOT in the cache manager, so
    * `Dataset.unpersist()` (an `uncacheQuery`) would be a no-op — the RDD
    * behind the plan's `LogicalRDD` leaf must be unpersisted directly.
    * No-ops on any other plan shape (e.g. a spill's parquet read-back,
    * whose lifecycle is its directory's). */
  private[graft] def releaseLocal(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => () // not a checkpoint-shaped plan; nothing pinned here
    }

  /** Scoped spill lifecycle: runs `body` against a fresh subdirectory of
    * `dir`, eagerly materialises the body's result, then deletes the
    * subdirectory — spills and all. Without this, every caller of an
    * iterative operator must remember that the FINAL spill outlives the
    * loop ([[Rolling]] keeps it alive on purpose — the result reads from
    * it), and a long-running pipeline accretes orphaned `ckpt-*` dirs.
    *
    * The materialisation is an eager `localCheckpoint()`: the result's
    * blocks are computed and pinned BEFORE the parquet spills under the
    * scope are deleted, so the returned frame never dangles on deleted
    * files. Callers that need the result durable on a real cluster should
    * write it to its sink inside `body` (and return the read-back frame);
    * the scope then deletes only intermediate state.
    *
    * Storage lifecycle: the pinned blocks occupy executor storage until
    * the session ends — a long-running pipeline that opens many scopes
    * should call `result.unpersist()` once the result has been written or
    * fully consumed. After unpersist the frame is NOT re-derivable (its
    * lineage was truncated and its spills deleted); treat it as spent. */
  def withCheckpointScope(spark: SparkSession, dir: String)
                         (body: String => DataFrame): DataFrame = {
    val scoped = s"${dir.stripSuffix("/")}/scope-${java.util.UUID.randomUUID()}"
    try body(scoped).localCheckpoint()
    finally delete(spark, scoped)
  }

  /** [[withCheckpointScope]]'s dir=None twin: runs `body`, eagerly
    * `localCheckpoint`s its result, then releases every RDD the body
    * pinned EXCEPT the result's own — so a composition that drives
    * checkpointing operators (banded pairs, connected components) holds
    * ONE pinned frame afterwards, not one per internal loop. Without
    * this, each such call leaks its loop survivors (e.g. the signature
    * checkpoint, the CC edge checkpoint and the CC final labels — all
    * correct to keep while the loop runs, none reachable by the caller
    * afterwards), and a long-running session accretes executor blocks
    * per invocation.
    *
    * Contract: single-owner — the scope assumes nothing else persists
    * RDDs in this SparkContext concurrently (the [[Rolling]]
    * single-threaded convention); anything the body pins is treated as
    * intermediate state of the body. The returned frame is spent after
    * [[releaseLocal]], like every localCheckpoint. */
  def withLocalCheckpointScope(spark: SparkSession)
                              (body: => DataFrame): DataFrame = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = body.localCheckpoint()
    val keep = out.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Set(lr.rdd.id)
      case _ => Set.empty[Int]
    }
    (sc.getPersistentRDDs.keySet -- before -- keep).foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    out
  }

  private def spill(spark: SparkSession, d: String, df: DataFrame): DataFrame =
    spillTo(spark, s"${d.stripSuffix("/")}/ckpt-${java.util.UUID.randomUUID()}", df)

  private def spillTo(spark: SparkSession, path: String, df: DataFrame): DataFrame = {
    // positional rename around the write: parquet rejects column names
    // with spaces/commas/semicolons, which caller-supplied id columns may
    // carry — the reliable path must accept whatever localCheckpoint does
    val names = df.columns.toSeq
    val safe = names.indices.map(i => s"c$i")
    df.toDF(safe: _*).write.parquet(path)
    spark.read.parquet(path).toDF(names: _*)
  }

  private def delete(spark: SparkSession, path: String): Unit =
    try {
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    } catch { case _: Exception => () } // cleanup is best-effort
}
