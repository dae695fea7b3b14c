package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table lifecycle for co-located joins and aggregations — the
  * pay-the-shuffle-once half of the 100 TB join story.
  *
  * A join between two fact tables re-shuffles BOTH sides on the join key
  * every time it runs. Writing each table bucketed (and sorted) by that
  * key moves the shuffle to write time: Spark records the bucket spec in
  * the catalog, the scan reports a `HashPartitioning(key, buckets)`
  * output partitioning, and every subsequent equi-join or aggregation on
  * the key runs with ZERO Exchange on the bucketed side — at 100 TB that
  * is the difference between re-shuffling 100 TB per query and never
  * shuffling it again. Sorting within buckets additionally removes the
  * Sort below a sort-merge join — Spark only trusts the recorded sort
  * order when each bucket is a single file (guaranteed here by the
  * pre-partitioning below) AND
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` is set
  * (both halves pinned by PlanQualitySpec).
  *
  * Both tables must use the SAME bucket count for the co-location to
  * hold (Spark only matches partitionings with equal bucket numbers).
  * Bucket count sizing at scale follows the shuffle-partition rule:
  * target ~128-256 MB per bucket file, so a 100 TB fact table wants
  * O(500k) buckets — the count is a caller decision, not a default
  * hidden here. Tables are EXTERNAL (caller-owned path), so the data
  * outlives the in-memory catalog and re-registers per session. */
object Bucketing {

  /** Idempotently materialise `df` as an external parquet table bucketed
    * and sorted by `keys` into `buckets` buckets at `path`. No-op when
    * the table is already registered in this session's catalog. */
  def ensureBucketed(spark: SparkSession, table: String, path: String,
                     keys: Seq[String], buckets: Int)(df: => DataFrame): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    if (!spark.catalog.tableExists(table)) {
      // Pre-partition on the bucket key with the bucket count:
      // HashPartitioning here uses the same murmur3 hash as the bucket id,
      // so each write task holds exactly one bucket's rows and each bucket
      // lands as ONE file — the layout Spark requires before it will trust
      // the per-bucket sort order and elide the Sort below a merge join.
      df.repartition(buckets, keys.map(col): _*)
        .write
        .format("parquet")
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .option("path", path)
        .saveAsTable(table)
    }
  }
}
