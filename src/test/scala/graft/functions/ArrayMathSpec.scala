package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native DotProduct must be value-identical to the interpreted HOF
  * rendering it replaces (`aggregate(zip_with(...))`) — same fold order,
  * same null semantics — across float/double arrays, nulls, mismatched
  * lengths and empties, in both codegen and interpreted evaluation. */
class ArrayMathSpec extends SparkSpec {

  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("dot matches the HOF reference on random float vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat()), Seq.fill(64)(rnd.nextFloat()))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
        ArrayMath.dot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"fold-order divergence: $r")
    }
  }

  test("dot null semantics: null array, null element, length mismatch, empty") {
    val df = Seq(
      (1L, Option(Seq[Option[Float]](Some(1f), Some(2f))), Option(Seq[Option[Float]](Some(3f), Some(4f)))),
      (2L, None, Option(Seq[Option[Float]](Some(1f)))),                       // null array
      (3L, Option(Seq[Option[Float]](Some(1f), None)), Option(Seq[Option[Float]](Some(1f), Some(1f)))), // null element
      (4L, Option(Seq[Option[Float]](Some(1f))), Option(Seq[Option[Float]](Some(1f), Some(1f)))),       // length mismatch
      (5L, Option(Seq.empty[Option[Float]]), Option(Seq.empty[Option[Float]]))) // empty
      .toDF("id", "a", "b")
    val got = df.select(col("id"), ArrayMath.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(11.0))
    assert(got(2L).isEmpty && got(3L).isEmpty && got(4L).isEmpty)
    assert(got(5L).contains(0.0))
    // and the HOF reference agrees on every row
    val hof = df.select(col("id"), hofDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(hof == got)
  }

  test("dot reaches whole-stage codegen (no interpreted HOF in the plan)") {
    // a range source (not a LocalTableScan, which folds the filter away)
    val df = spark.range(100).select(col("id"),
      array(col("id").cast("float"), lit(2f)).as("a"),
      array(lit(3f), lit(-4f)).as("b"))
    val q = df.filter(ArrayMath.dot(col("a"), col("b")) > 0)
    // the `*(n)` prefix is the WholeStageCodegen marker in the simple
    // plan string; the HOF version's Filter shows unstarred
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_dot")),
      s"graft_dot not inside a codegen stage:\n$plan")
    assert(!plan.contains("aggregate(zip_with"), s"HOF crept back:\n$plan")
    assert(q.count() == 97) // 3*id - 8 > 0 ⇔ id >= 3
  }

  test("every numeric element type is accepted and matches the HOF reference") {
    // the HOF rendering this expression replaced cast ANY castable element
    // to double, so the public operator must accept the full NumericType
    // family — short/byte/decimal included, not just float/double/int/long
    val base = Seq((1L, Seq(1, -2, 3), Seq(4, 5, -6))).toDF("id", "a", "b")
    val want = 1 * 4 + -2 * 5 + 3 * -6 // = -24
    for (t <- Seq("smallint", "tinyint", "int", "bigint", "float", "double", "decimal(6,2)")) {
      val df = base.select(
        col("a").cast(s"array<$t>").as("a"), col("b").cast(s"array<$t>").as("b"))
      val got = df.select(ArrayMath.dot(col("a"), col("b")).as("native"),
          hofDot(col("a"), col("b")).as("hof")).head
      assert(got.getDouble(0) == want.toDouble, s"element type $t")
      assert(got.getDouble(0) == got.getDouble(1), s"HOF divergence for $t")
    }
  }

  test("mixed float/double (literal side) and interpreted eval agree") {
    val df = Seq((1L, Seq(0.5f, -1.5f))).toDF("id", "a")
    val v = Seq(2.0, 4.0)
    val native = df.select(graft.operators.Ann.dotLit(col("a"), v)).head.getDouble(0)
    assert(native == 0.5 * 2.0 + -1.5 * 4.0)
    // interpreted path: evaluate via a non-codegen context (local relation
    // with codegen disabled)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(graft.operators.Ann.dotLit(col("a"), v)).head.getDouble(0)
      assert(interp == native)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
