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
  * error direction is MORE, SMALLER files, never one giant task. Callers
  * who know their compression ratio can fold it into
  * `targetBytesPerFile` (e.g. 4× the desired on-disk size for text-heavy
  * columns). */
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
    * .decontaminate]] route-logging convention). */
  def sizedWrite(df: DataFrame, path: String, format: String = "parquet",
                 targetBytesPerFile: Long = 256L << 20,
                 balance: Boolean = true): Int = {
    require(targetBytesPerFile > 0, "targetBytesPerFile must be positive")
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = ((est + targetBytesPerFile - 1) / targetBytesPerFile)
      .max(1).min(1 << 20).toInt
    org.slf4j.LoggerFactory.getLogger(getClass).info(
      s"sizedWrite: estimated $est bytes / target $targetBytesPerFile -> $n file(s)")
    val sized = if (balance) df.repartition(n) else df.coalesce(n)
    sized.write.format(format).mode("overwrite").save(path)
    n
  }
}
