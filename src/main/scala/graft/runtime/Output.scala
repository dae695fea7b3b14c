package graft.runtime

import org.apache.spark.sql.DataFrame

/** Write-path output sizing — the small-files guard for the sink half of
  * the 100 TB story. A naive `df.write` emits one file per task: a
  * 100 TB job with 100k shuffle partitions writes 100k files per table,
  * and every downstream scan pays the listing + open cost; conversely a
  * carelessly coalesced write funnels the job through a handful of
  * tasks. This helper picks the file count FROM THE DATA: Catalyst's own
  * size estimate (`optimizedPlan.stats.sizeInBytes` — the same signal
  * broadcast decisions consult) divided by a target bytes-per-file.
  *
  * The estimate is logical (decompressed row bytes), so on-disk parquet
  * lands smaller than the target by roughly the compression ratio — the
  * error direction is usually MORE, SMALLER files. Callers who know
  * their compression ratio can fold it into `targetBytesPerFile` (e.g.
  * 4× the desired on-disk size for text-heavy columns).
  *
  * One failure mode is NOT merely "more files": without CBO statistics
  * Spark's size-only estimator propagates a join as the PRODUCT of its
  * children's sizes (and inflates aggregates), so writing a join result
  * can estimate astronomically high. [[Output.sizedWrite]] therefore
  * clamps the file count to a plausibility cap tied to the input's
  * actual partition count (overridable via `maxFiles`) and WARNS when
  * the clamp fires — a silent million-file repartition is a job-killing
  * shuffle, not a sizing nuance. Frames fresh off a scan or exchange
  * have trustworthy estimates; deep join/aggregate plans may not —
  * prefer materialising (or passing `maxFiles`) for those. */
object Output {

  /** Write `df` as `format` at `path` in approximately
    * `sizeInBytes / targetBytesPerFile` files. `balance = true` (default)
    * round-robin repartitions — one extra shuffle, evenly sized files,
    * the right choice after a skewed aggregation; `balance = false`
    * coalesces — no shuffle, but file sizes inherit upstream partition
    * skew and the plan above the write runs at the REDUCED parallelism
    * (coalesce folds into the parent stage), so reserve it for
    * already-balanced narrow pipelines. Returns the chosen file count
    * (one visible sizing decision, the [[graft.operators.TextDedup
    * .decontaminate]] route-logging convention).
    *
    * `maxFiles` (0 = auto) bounds the count against estimator blow-ups:
    * auto is `max(64 × defaultParallelism, 4096)` — generous for any
    * honest estimate (64 target-size files per core is >16 GB of logical
    * rows per core at the default target), but catches the
    * join-size-product pathology, where the clamp fires with a loud WARN
    * instead of scheduling a ~1M-task shuffle. (The cap deliberately
    * reads cluster parallelism, not `df.rdd.getNumPartitions` — under
    * AQE materialising the RDD would EXECUTE the upstream stages once
    * just to count partitions, then the write would run them again.) */
  def sizedWrite(df: DataFrame, path: String, format: String = "parquet",
                 targetBytesPerFile: Long = 256L << 20,
                 balance: Boolean = true, maxFiles: Int = 0): Int = {
    require(targetBytesPerFile > 0, "targetBytesPerFile must be positive")
    require(maxFiles >= 0, "maxFiles must be >= 0 (0 = auto)")
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val raw = ((est + targetBytesPerFile - 1) / targetBytesPerFile).max(1)
    val cores = df.sparkSession.sparkContext.defaultParallelism.max(1)
    val cap: Long =
      if (maxFiles > 0) maxFiles.toLong else math.max(64L * cores, 4096L)
    if (raw > cap) log.warn(
      s"sizedWrite: size estimate $est bytes implies $raw files — clamping " +
      s"to $cap (64 x $cores cores). Size-only estimation multiplies child " +
      "sizes through joins; if this frame is a join/aggregate result the " +
      "estimate is untrustworthy — pass maxFiles explicitly or " +
      "materialise the input first.")
    val n = raw.min(cap).min(1L << 20).toInt
    log.info(
      s"sizedWrite: estimated $est bytes / target $targetBytesPerFile -> $n file(s)")
    val sized = if (balance) df.repartition(n) else df.coalesce(n)
    sized.write.format(format).mode("overwrite").save(path)
    n
  }

  /** Materialise a seeded deterministic training order as ONE ordered
    * file per shard — the dataloader-facing end of
    * [[graft.operators.TextStats.shuffleShards]]: `shard=<k>/` partition
    * directories, each holding a single file whose row order IS the
    * within-shard `pos` order, so a reader streaming a shard file top to
    * bottom replays the epoch-0 permutation with no sort of its own.
    *
    * Shape: shard assignment is the narrow md5 projection; ONE
    * repartition keyed on the shard column co-locates each shard in
    * exactly one task (hash collisions may pack several shards into one
    * task — each still writes its own partition directory, ordered,
    * because the in-task sort is (shard, pos)); the writer preserves
    * iterator order. `shards` is the parallelism of this write — pick it
    * ≫ executor count at scale, as the operator scaladoc says. */
  def writeShards(df: DataFrame, keyCol: String, shards: Int, seed: String,
                  path: String, format: String = "parquet"): Unit = {
    import org.apache.spark.sql.functions.col
    graft.operators.TextStats.shuffleShards(df, keyCol, shards, seed)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.format(format).mode("overwrite").partitionBy("shard").save(path)
  }
}
