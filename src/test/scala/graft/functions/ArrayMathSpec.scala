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

  test("centroidSqDistances: values, entry order, argmin agreement, null semantics") {
    val rnd = new scala.util.Random(11)
    val cents = Seq.fill(7)(Seq.fill(16)(rnd.nextDouble()))
    val ids = (0L until 7L).toSeq
    val rows = (1 to 100).map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat())))
    val df = rows.toDF("id", "v")
    val got = df.select(col("id"),
        ArrayMath.centroidSqDistances(col("v"), cents).as("ds"),
        ArrayMath.nearestCentroid(col("v"), ids, cents).as("cell"))
      .collect()
    val byId = rows.toMap
    got.foreach { r =>
      val v = byId(r.getLong(0)).map(_.toDouble)
      // the reference arithmetic: s2 accumulated left-to-right over the
      // loaded values, each norm a left fold, (s2 - 2*dot) + n2
      val s2 = v.foldLeft(0.0)((a, x) => a + x * x)
      val want = cents.map { c =>
        val dot = v.zip(c).foldLeft(0.0)((a, p) => a + p._1 * p._2)
        val n2 = c.foldLeft(0.0)((a, x) => a + x * x)
        (s2 - 2.0 * dot) + n2
      }
      val ds = r.getSeq[Double](1)
      assert(ds == want, s"distance-table divergence for id ${r.getLong(0)}")
      // first minimum of the table IS the argmin expression's choice
      val first = ds.indexOf(ds.min)
      assert(r.getLong(2) == ids(first), "table argmin != NearestCentroid")
    }
    // interpreted eval agrees
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(ArrayMath.centroidSqDistances(col("v"), cents)).collect()
      val gen = got.map(_.getSeq[Double](1))
      assert(interp.map(_.getSeq[Double](0)).toSeq == gen.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // null semantics: null array / null element / length mismatch → null
    val bad = Seq(
      (1L, Option(Seq[Option[Float]](Some(1f), None) ++ Seq.fill(14)(Option(0f)))),
      (2L, None),
      (3L, Option(Seq[Option[Float]](Some(1f), Some(2f))))) // wrong dim
      .toDF("id", "v")
    val nulls = bad.select(col("id"),
        ArrayMath.centroidSqDistances(col("v"), cents).as("ds")).collect()
    nulls.foreach(r => assert(r.isNullAt(1), s"expected null for id ${r.getLong(0)}"))
  }

  test("centroidResidual: subtraction, sparse-id lookup, null semantics, id-order guard") {
    val cents = Seq(Seq(1.0, 2.0, 3.0), Seq(-1.0, 0.0, 1.0))
    val ids = Seq(10L, 40L) // non-contiguous ascending — binary search path
    val df = Seq(
      (1L, Option(Seq(4f, 4f, 4f)), Option(10L)),
      (2L, Option(Seq(4f, 4f, 4f)), Option(40L)),
      (3L, Option(Seq(4f, 4f, 4f)), Option(11L)), // unknown cell
      (4L, None: Option[Seq[Float]], Option(10L)), // null vector
      (5L, Option(Seq(4f, 4f)), Option(10L)))      // length mismatch
      .toDF("id", "v", "cell")
    val got = df.select(col("id"),
        ArrayMath.centroidResidual(col("v"), col("cell"), ids, cents).as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Double](1)))).toMap
    assert(got(1L).contains(Seq(3.0, 2.0, 1.0)))
    assert(got(2L).contains(Seq(5.0, 4.0, 3.0)))
    assert(got(3L).isEmpty && got(4L).isEmpty && got(5L).isEmpty)
    // interpreted eval agrees
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(col("id"),
          ArrayMath.centroidResidual(col("v"), col("cell"), ids, cents).as("r"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getSeq[Double](1)))).toMap
      assert(interp == got)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // descending ids must be rejected up front (binary search + tie parity)
    intercept[IllegalArgumentException] {
      df.select(ArrayMath.centroidResidual(col("v"), col("cell"),
        Seq(40L, 10L), cents)).collect()
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
