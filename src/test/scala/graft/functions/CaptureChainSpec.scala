package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CaptureChainSpec extends SparkSpec {
  import spark.implicits._

  /** The composed rendering the fused expression replaced — kept as the
    * parity oracle (NonTabular's old fast path verbatim). */
  private def rendered(el: org.apache.spark.sql.Column,
                       patterns: Seq[String]): org.apache.spark.sql.Column = {
    val out = patterns.foldLeft(el) { (v, p) =>
      val s = coalesce(v, lit(""))
      when(s.rlike(p), regexp_extract(s, p, 1)).otherwise(lit(null).cast("string"))
    }
    val captured = when(out.isNull, out)
      .otherwise(regexp_replace(out, "^[\\s\\u0000]+|[\\s\\u0000]+$", ""))
    val keep = captured.isNotNull && trim(captured) =!= ""
    when(keep, captured).otherwise(lit(""))
  }

  private val cases: Seq[(Option[String], Seq[String])] = Seq(
    (Some("=== ORDER 42"), Seq("^=== ORDER (\\d+)$")),        // plain hit
    (Some("=== ORDER 42"), Seq("^NOPE (\\d+)$")),             // miss -> ""
    (None, Seq("^(.*)$")),                                    // null line -> chain from ""
    (Some("PRIORITY:   padded\t "), Seq("^PRIORITY: (.*)$")), // strip both ends
    (Some("STATUS:  x\u0000 "), Seq("^STATUS: (.*)$")),   // NUL strip
    (Some("a: x b: y"), Seq("^a: (.*)$", "x b: (.*)$")),      // chained captures
    (Some("a: x"), Seq("^a: (.*)$", "^MISS (.*)$", "(.*)")),  // mid-chain miss -> "" rematch
    (Some("blank:   "), Seq("^blank:(.*)$")),                 // blank survivor -> ""
    (Some("opt"), Seq("^opt(?: (\\S+))?$")),                  // group absent -> ""
    (Some("  keep inner  spaces  "), Seq("^\\s*(.*\\S)\\s*$")))

  test("fused capture == composed rendering on every edge case") {
    val df = cases.zipWithIndex
      .map { case ((s, _), i) => (i, s.orNull) }.toDF("i", "line")
    cases.zipWithIndex.foreach { case ((_, pats), i) =>
      val row = df.filter(col("i") === i).select(
        CaptureChain.captureChain(col("line"), pats).as("fused"),
        rendered(col("line"), pats).as("composed")).head()
      assert(row.getString(0) == row.getString(1),
        s"case $i: fused='${row.getString(0)}' composed='${row.getString(1)}'")
      assert(!row.isNullAt(0), s"case $i: fused must never be null")
    }
  }

  test("fused capture is codegen-native and never null in the plan") {
    val df = Seq(Tuple1("=== ORDER 7")).toDF("line")
    val out = df.select(CaptureChain.captureChain(col("line"), Seq("^=== ORDER (\\d+)$")))
    assert(out.queryExecution.executedPlan.toString.contains("graft_capture_chain"))
    assert(!out.schema.head.nullable)
    assert(out.head().getString(0) == "7")
  }
}
