package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.QueryPack.q1Agg(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.QueryPack.all
  /** Oracle-pinned NEGATIVE CONTROLS: queries whose own scaladoc steers
    * users away from running them, kept in `queries` so the correctness
    * gate pins their semantics bit-for-bit, but excluded from
    * `graft.Bench`'s headline timing (they can still be timed by naming
    * them explicitly in Bench's query filter).
    *
    * `x_ann_ivf_hier` pairs the two-level coarse quantizer with the
    * all-pairs within-cell consumer — the configuration
    * `Ann.assignCellsHier`'s scaladoc forbids (the hier assignment's
    * measured Σpop² skew is exactly what the all-pairs join pays: 66.8 s
    * at sf10 vs 1.2 s for the shipped probe pairing). It exists to pin
    * the raw hier assignment against DuckDB at correctness scale; timing
    * it in every campaign would let a query the docs tell users not to
    * run dominate the totals (round-10 verdict, "What's wrong" #2). */
  def negativeControls: Set[String] = Set("x_ann_ivf_hier")
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.QueryPack.oracles
}
