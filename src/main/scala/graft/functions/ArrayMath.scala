package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd array math for the embedding operators.
  *
  * The composable rendering of a dot product —
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, _ + _)` — never
  * enters whole-stage codegen: Spark's higher-order functions evaluate
  * INTERPRETED (`ZipWith.eval` / `ArrayAggregate.eval` allocate a lambda
  * frame per element). Thread dumps of the sf10 bench showed all 32
  * cores inside exactly those frames for the bucket-join queries. This
  * expression generates the obvious fused loop instead — no
  * intermediate array, no lambda dispatch — and keeps the SAME
  * left-to-right fold order and null semantics as the HOF version, so
  * every DuckDB oracle hash is unchanged:
  *
  *   - either array NULL → NULL (BinaryExpression contract);
  *   - length mismatch → NULL (zip_with pads with null, the aggregate
  *     then folds to null);
  *   - any NULL element → NULL (null product poisons the running sum);
  *   - empty arrays → 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType
  // can return null even for non-null inputs (mismatch / null element)
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  // any NumericType element works (the HOF rendering this replaced cast
  // every castable element to double — the public operator must not be
  // narrower than that): float/double/int/long/short/byte/decimal
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(et, _) => et.isInstanceOf[NumericType]
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of numeric elements, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def getD(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType      => a.getFloat(i).toDouble
    case DoubleType     => a.getDouble(i)
    case IntegerType    => a.getInt(i).toDouble
    case LongType       => a.getLong(i).toDouble
    case ShortType      => a.getShort(i).toDouble
    case ByteType       => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other          => throw new IllegalStateException(s"unreachable: $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += getD(a, i, lt) * getD(b, i, rt)
      i += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def acc(v: String, i: String, t: DataType): String = t match {
      case FloatType      => s"(double) $v.getFloat($i)"
      case DoubleType     => s"$v.getDouble($i)"
      case IntegerType    => s"(double) $v.getInt($i)"
      case LongType       => s"(double) $v.getLong($i)"
      case ShortType      => s"(double) $v.getShort($i)"
      case ByteType       => s"(double) $v.getByte($i)"
      case d: DecimalType =>
        s"$v.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
      case other          => throw new IllegalStateException(s"unreachable: $other")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${acc(a, i, elemType(left))} * ${acc(b, i, elemType(right))};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Nearest-constant-vector argmin: the id of the centroid minimising
  * `(v·v − 2·v·c) + ‖c‖²` over a DRIVER-RESIDENT centroid matrix, ties →
  * the earliest centroid (ids must therefore be in ascending order for
  * ORDER BY-style oracle parity).
  *
  * Why an expression and not `array(dot, dot, …)` + `array_min`: the
  * array rendering inlines K 64-iteration loops into ONE generated
  * method. Under whole-stage codegen that method cannot be split
  * (values live in locals, not a row), so past K ≈ 100 it blows the
  * JIT's ~8 KB bytecode ceiling and the stage executes in the JVM
  * *bytecode interpreter* — measured 4.5× slower than even the
  * interpreted-HOF rendering it replaced (sf1, K = 142; SCALING.md
  * round 10). Here the matrix is a constant in the references array and
  * the generated code is two tiny loops — size-independent of K, always
  * JIT-compiled, and the plan string stays free of K×64 literals.
  *
  * Arithmetic parity (oracle-stable): per-element products in double,
  * summed left-to-right; `‖c‖²` folded on the driver in the same order;
  * `d = (v·v − 2·dot) + ‖c‖²` — exactly the dot expansion the DuckDB
  * oracles compute, so argmins match bit-for-bit. Null array / length
  * mismatch / null element → NULL (the array rendering's semantics). */
case class NearestCentroid(child: Expression, ids: Seq[Long],
                           cents: Seq[Seq[Double]])
    extends UnaryExpression {

  require(ids.nonEmpty && ids.length == cents.length,
    s"ids (${ids.length}) and centroid rows (${cents.length}) must match and be non-empty")
  require(cents.forall(_.length == cents.head.length),
    "all centroid rows must share one dimension")

  override def prettyName: String = "graft_nearest_centroid"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val cm: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    cm.map(_.foldLeft(0.0)((a, x) => a + x * x))
  @transient private lazy val idArr: Array[Long] = ids.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et.isInstanceOf[NumericType] =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array of numeric elements, got ${other.catalogString}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != cm(0).length) return null
    val t = elemType
    val v = new Array[Double](n)
    var s2 = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = t match {
        case FloatType      => a.getFloat(i).toDouble
        case DoubleType     => a.getDouble(i)
        case IntegerType    => a.getInt(i).toDouble
        case LongType       => a.getLong(i).toDouble
        case ShortType      => a.getShort(i).toDouble
        case ByteType       => a.getByte(i).toDouble
        case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
        case other          => throw new IllegalStateException(s"unreachable: $other")
      }
      v(i) = x
      s2 += x * x
      i += 1
    }
    var best = Double.PositiveInfinity
    var bi = 0
    var c = 0
    while (c < cm.length) {
      val cv = cm(c)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * cv(j); j += 1 }
      val d = (s2 - 2.0 * dot) + norms(c)
      if (d < best) { best = d; bi = c }
      c += 1
    }
    idArr(bi)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmRef = ctx.addReferenceObj("cm", cm, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    val idsRef = ctx.addReferenceObj("ids", idArr, "long[]")
    def get(a: String, i: String): String = elemType match {
      case FloatType      => s"(double) $a.getFloat($i)"
      case DoubleType     => s"$a.getDouble($i)"
      case IntegerType    => s"(double) $a.getInt($i)"
      case LongType       => s"(double) $a.getLong($i)"
      case ShortType      => s"(double) $a.getShort($i)"
      case ByteType       => s"(double) $a.getByte($i)"
      case d: DecimalType => s"$a.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
      case other          => throw new IllegalStateException(s"unreachable: $other")
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val s2 = ctx.freshName("s2")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val j = ctx.freshName("j")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $cmRef[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $v = new double[$n];
         |  double $s2 = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $v[$i] = ${get(a, i)};
         |    $s2 += $v[$i] * $v[$i];
         |  }
         |  if (!${ev.isNull}) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bi = 0;
         |    for (int $c = 0; $c < $cmRef.length; $c++) {
         |      final double[] $cv = $cmRef[$c];
         |      double $dot = 0.0;
         |      for (int $j = 0; $j < $n; $j++) { $dot += $v[$j] * $cv[$j]; }
         |      final double $d = ($s2 - 2.0 * $dot) + $normsRef[$c];
         |      if ($d < $best) { $best = $d; $bi = $c; }
         |    }
         |    ${ev.value} = $idsRef[$bi];
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Two-level (coarse → fine) nearest-centroid argmin fused into ONE
  * expression: centroids are grouped into fixed-size blocks in id order;
  * the input first argmins over each block's FIRST centroid (the
  * representative, ties → earlier block), then argmins over the chosen
  * block's centroids only (ties → earlier centroid) — ~2√K distance
  * loops per row instead of K.
  *
  * Why fused and not a CASE chain of per-block [[NearestCentroid]]s:
  * whole-stage codegen inlines every CASE branch into one generated
  * method, so at B ≈ √K blocks the chain re-creates exactly the
  * JIT-bytecode-ceiling blowup the flat argmin hit at K ≈ 100 — and
  * worse, it drags the whole fused stage (join, scoring) into the
  * bytecode interpreter with it. Measured at sf10 (K = 447, B = 22):
  * the CASE rendering ran `x_ann_ivf_hier_probe` at 187–200 s where the
  * flat-assignment twin took 1.5 s (SCALING.md round 10). Here the
  * block structure lives in reference arrays and the generated code is
  * three tiny loops — size-independent of K.
  *
  * Arithmetic parity with the CASE rendering is exact: same
  * `(v·v − 2·v·c) + ‖c‖²` expansion, same fold order, same two
  * first-minimum tie rules — all oracle hashes unchanged. Null/length
  * semantics as [[NearestCentroid]]. */
case class NearestCentroidHier(child: Expression, ids: Seq[Long],
                               cents: Seq[Seq[Double]], blockSize: Int)
    extends UnaryExpression {

  require(ids.nonEmpty && ids.length == cents.length,
    s"ids (${ids.length}) and centroid rows (${cents.length}) must match and be non-empty")
  require(cents.forall(_.length == cents.head.length),
    "all centroid rows must share one dimension")
  require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")

  override def prettyName: String = "graft_nearest_centroid_hier"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val cm: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    cm.map(_.foldLeft(0.0)((a, x) => a + x * x))
  @transient private lazy val idArr: Array[Long] = ids.toArray
  // block b spans [starts(b), starts(b+1)); representatives sit at starts
  @transient private lazy val starts: Array[Int] =
    (0 until cm.length by blockSize).toArray :+ cm.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et.isInstanceOf[NumericType] =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array of numeric elements, got ${other.catalogString}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != cm(0).length) return null
    val t = elemType
    val v = new Array[Double](n)
    var s2 = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = t match {
        case FloatType      => a.getFloat(i).toDouble
        case DoubleType     => a.getDouble(i)
        case IntegerType    => a.getInt(i).toDouble
        case LongType       => a.getLong(i).toDouble
        case ShortType      => a.getShort(i).toDouble
        case ByteType       => a.getByte(i).toDouble
        case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
        case other          => throw new IllegalStateException(s"unreachable: $other")
      }
      v(i) = x
      s2 += x * x
      i += 1
    }
    var best = Double.PositiveInfinity
    var bb = 0
    var b = 0
    while (b < starts.length - 1) {
      val cv = cm(starts(b))
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * cv(j); j += 1 }
      val d = (s2 - 2.0 * dot) + norms(starts(b))
      if (d < best) { best = d; bb = b }
      b += 1
    }
    best = Double.PositiveInfinity
    var bi = starts(bb)
    var c = starts(bb)
    while (c < starts(bb + 1)) {
      val cv = cm(c)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * cv(j); j += 1 }
      val d = (s2 - 2.0 * dot) + norms(c)
      if (d < best) { best = d; bi = c }
      c += 1
    }
    idArr(bi)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmRef = ctx.addReferenceObj("cm", cm, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    val idsRef = ctx.addReferenceObj("ids", idArr, "long[]")
    val startsRef = ctx.addReferenceObj("starts", starts, "int[]")
    def get(a: String, i: String): String = elemType match {
      case FloatType      => s"(double) $a.getFloat($i)"
      case DoubleType     => s"$a.getDouble($i)"
      case IntegerType    => s"(double) $a.getInt($i)"
      case LongType       => s"(double) $a.getLong($i)"
      case ShortType      => s"(double) $a.getShort($i)"
      case ByteType       => s"(double) $a.getByte($i)"
      case d: DecimalType => s"$a.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
      case other          => throw new IllegalStateException(s"unreachable: $other")
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val s2 = ctx.freshName("s2")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bb = ctx.freshName("bb")
      val b = ctx.freshName("b")
      val bi = ctx.freshName("bi")
      val c = ctx.freshName("c")
      val dotC = ctx.freshName("dotc")
      val dotF = ctx.freshName("dotf")
      val jC = ctx.freshName("jc")
      val jF = ctx.freshName("jf")
      val cvC = ctx.freshName("cvc")
      val cvF = ctx.freshName("cvf")
      val dC = ctx.freshName("dc")
      val dF = ctx.freshName("df")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $cmRef[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $v = new double[$n];
         |  double $s2 = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $v[$i] = ${get(a, i)};
         |    $s2 += $v[$i] * $v[$i];
         |  }
         |  if (!${ev.isNull}) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bb = 0;
         |    for (int $b = 0; $b < $startsRef.length - 1; $b++) {
         |      final double[] $cvC = $cmRef[$startsRef[$b]];
         |      double $dotC = 0.0;
         |      for (int $jC = 0; $jC < $n; $jC++) { $dotC += $v[$jC] * $cvC[$jC]; }
         |      final double $dC = ($s2 - 2.0 * $dotC) + $normsRef[$startsRef[$b]];
         |      if ($dC < $best) { $best = $dC; $bb = $b; }
         |    }
         |    $best = Double.POSITIVE_INFINITY;
         |    int $bi = $startsRef[$bb];
         |    for (int $c = $startsRef[$bb]; $c < $startsRef[$bb + 1]; $c++) {
         |      final double[] $cvF = $cmRef[$c];
         |      double $dotF = 0.0;
         |      for (int $jF = 0; $jF < $n; $jF++) { $dotF += $v[$jF] * $cvF[$jF]; }
         |      final double $dF = ($s2 - 2.0 * $dotF) + $normsRef[$c];
         |      if ($dF < $best) { $best = $dF; $bi = $c; }
         |    }
         |    ${ev.value} = $idsRef[$bi];
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidHier =
    copy(child = newChild)
}

/** Squared-L2 distances `(v·v − 2·v·c) + ‖c‖²` to EVERY row of a
  * driver-resident constant matrix, in matrix order, as one
  * `array<double>` — the native rendering of the K-wide distance table
  * that PQ/IVF query sides build (`Ann.sqDistances`).
  *
  * Why an expression: the `array(dot, dot, …)` rendering materialises K
  * separate expression trees — K inlined loop bodies in the generated
  * method — and past K ≈ 100 that crosses the JIT's ~8 KB bytecode
  * ceiling ([[NearestCentroid]]'s scaladoc tells the measured story); at
  * the 8-bit PQ operating point (ksub = 256, m = 8 → 2048 entries in one
  * projection) it crosses janino's hard 64 KB METHOD limit outright and
  * the stage falls back to interpreted eval. Here the matrix lives in a
  * reference array and the generated code is two fixed-size loops filling
  * a primitive array — size-independent of K, like its argmin sibling.
  *
  * Arithmetic parity with the array rendering is exact: same expansion,
  * same element order (`v·v` accumulated left-to-right during the load
  * loop, `‖c‖²` folded on the driver left-to-right), so every oracle
  * hash is unchanged. Null array / length mismatch / null element →
  * NULL (the array rendering's semantics). */
case class CentroidSqDistances(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty, "centroid matrix must be non-empty")
  require(cents.forall(_.length == cents.head.length),
    "all centroid rows must share one dimension")

  override def prettyName: String = "graft_centroid_sqdists"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val cm: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    cm.map(_.foldLeft(0.0)((a, x) => a + x * x))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et.isInstanceOf[NumericType] =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array of numeric elements, got ${other.catalogString}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != cm(0).length) return null
    val t = elemType
    val v = new Array[Double](n)
    var s2 = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = t match {
        case FloatType      => a.getFloat(i).toDouble
        case DoubleType     => a.getDouble(i)
        case IntegerType    => a.getInt(i).toDouble
        case LongType       => a.getLong(i).toDouble
        case ShortType      => a.getShort(i).toDouble
        case ByteType       => a.getByte(i).toDouble
        case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
        case other          => throw new IllegalStateException(s"unreachable: $other")
      }
      v(i) = x
      s2 += x * x
      i += 1
    }
    val out = new Array[Double](cm.length)
    var c = 0
    while (c < cm.length) {
      val cv = cm(c)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * cv(j); j += 1 }
      out(c) = (s2 - 2.0 * dot) + norms(c)
      c += 1
    }
    ArrayData.toArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmRef = ctx.addReferenceObj("cm", cm, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    def get(a: String, i: String): String = elemType match {
      case FloatType      => s"(double) $a.getFloat($i)"
      case DoubleType     => s"$a.getDouble($i)"
      case IntegerType    => s"(double) $a.getInt($i)"
      case LongType       => s"(double) $a.getLong($i)"
      case ShortType      => s"(double) $a.getShort($i)"
      case ByteType       => s"(double) $a.getByte($i)"
      case d: DecimalType => s"$a.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
      case other          => throw new IllegalStateException(s"unreachable: $other")
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val s2 = ctx.freshName("s2")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val j = ctx.freshName("j")
      val cv = ctx.freshName("cv")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $cmRef[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $v = new double[$n];
         |  double $s2 = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $v[$i] = ${get(a, i)};
         |    $s2 += $v[$i] * $v[$i];
         |  }
         |  if (!${ev.isNull}) {
         |    final double[] $out = new double[$cmRef.length];
         |    for (int $c = 0; $c < $cmRef.length; $c++) {
         |      final double[] $cv = $cmRef[$c];
         |      double $dot = 0.0;
         |      for (int $j = 0; $j < $n; $j++) { $dot += $v[$j] * $cv[$j]; }
         |      $out[$c] = ($s2 - 2.0 * $dot) + $normsRef[$c];
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidSqDistances =
    copy(child = newChild)
}

/** Residual to a DRIVER-RESIDENT centroid: `v − cents[indexOf(cell)]`,
  * element-wise in double — the narrow per-row step that makes residual
  * IVF-PQ (`Ann.ivfPqSearch(residual = true)`) a single native scan.
  *
  * Why an expression: the composable renderings both fail the 100 TB
  * posture — `zip_with(v, element_at(map_literal, cell), _-_)` is an
  * interpreted HOF on the corpus scan (the round-8/9 disease), and
  * `element_at` on a map LITERAL is an O(K) linear probe per row.
  * Here the centroid matrix sits in a reference array, the cell id
  * resolves by binary search over the (ascending) id array — O(log K),
  * no boxing — and the subtraction is one fused loop emitting a
  * primitive `UnsafeArrayData`.
  *
  * Parity: each element is `double(v[j]) − c[j]` — a single IEEE op,
  * no fold order to preserve — so DuckDB's `list_transform(range…,
  * j -> CAST(v[j] AS DOUBLE) - c[j])` reproduces it bit-for-bit. Null
  * array / unknown cell / length mismatch / null element → NULL. */
case class CentroidResidual(vec: Expression, cell: Expression,
                            ids: Seq[Long], cents: Seq[Seq[Double]])
    extends BinaryExpression {

  require(ids.nonEmpty && ids.length == cents.length,
    s"ids (${ids.length}) and centroid rows (${cents.length}) must match and be non-empty")
  require(cents.forall(_.length == cents.head.length),
    "all centroid rows must share one dimension")
  require(ids == ids.sorted,
    "centroid ids must ascend (binary-search lookup + tie parity)")

  override def left: Expression = vec
  override def right: Expression = cell
  override def prettyName: String = "graft_centroid_residual"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val cm: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Long] = ids.toArray

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, cell.dataType) match {
    case (ArrayType(et, _), LongType) if et.isInstanceOf[NumericType] =>
      TypeCheckResult.TypeCheckSuccess
    case (v, c) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array of numeric, bigint), got " +
        s"${v.catalogString} and ${c.catalogString}")
  }

  private def elemType: DataType =
    vec.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any, c: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val ci = java.util.Arrays.binarySearch(idArr, c.asInstanceOf[Long])
    if (ci < 0 || n != cm(0).length) return null
    val t = elemType
    val cv = cm(ci)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = t match {
        case FloatType      => a.getFloat(i).toDouble
        case DoubleType     => a.getDouble(i)
        case IntegerType    => a.getInt(i).toDouble
        case LongType       => a.getLong(i).toDouble
        case ShortType      => a.getShort(i).toDouble
        case ByteType       => a.getByte(i).toDouble
        case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
        case other          => throw new IllegalStateException(s"unreachable: $other")
      }
      out(i) = x - cv(i)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmRef = ctx.addReferenceObj("cm", cm, "double[][]")
    val idsRef = ctx.addReferenceObj("ids", idArr, "long[]")
    def get(a: String, i: String): String = elemType match {
      case FloatType      => s"(double) $a.getFloat($i)"
      case DoubleType     => s"$a.getDouble($i)"
      case IntegerType    => s"(double) $a.getInt($i)"
      case LongType       => s"(double) $a.getLong($i)"
      case ShortType      => s"(double) $a.getShort($i)"
      case ByteType       => s"(double) $a.getByte($i)"
      case d: DecimalType => s"$a.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
      case other          => throw new IllegalStateException(s"unreachable: $other")
    }
    nullSafeCodeGen(ctx, ev, (a, c) => {
      val n = ctx.freshName("n")
      val ci = ctx.freshName("ci")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |final int $ci = java.util.Arrays.binarySearch($idsRef, $c);
         |if ($ci < 0 || $n != $cmRef[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $out[$i] = ${get(a, i)} - $cmRef[$ci][$i];
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidResidual =
    copy(vec = newLeft, cell = newRight)
}

object ArrayMath {
  /** Column-level dot product backed by [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column-level nearest-centroid argmin backed by [[NearestCentroid]].
    * `ids` must be ascending for first-minimum/ORDER BY tie parity. */
  def nearestCentroid(a: Column, ids: Seq[Long], cents: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(
      NearestCentroid(GraftColumnBridge.expression(a), ids, cents))

  /** Column-level two-level argmin backed by [[NearestCentroidHier]].
    * `ids` must be ascending for first-minimum/ORDER BY tie parity. */
  def nearestCentroidHier(a: Column, ids: Seq[Long], cents: Seq[Seq[Double]],
                          blockSize: Int): Column =
    GraftColumnBridge.column(
      NearestCentroidHier(GraftColumnBridge.expression(a), ids, cents, blockSize))

  /** Column-level K-wide squared-distance table backed by
    * [[CentroidSqDistances]] (entries in `cents` order). */
  def centroidSqDistances(a: Column, cents: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(
      CentroidSqDistances(GraftColumnBridge.expression(a), cents))

  /** Column-level residual to the `cell`-identified centroid, backed by
    * [[CentroidResidual]]. `ids` must be ascending. */
  def centroidResidual(vec: Column, cell: Column, ids: Seq[Long],
                       cents: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(
      CentroidResidual(GraftColumnBridge.expression(vec),
        GraftColumnBridge.expression(cell), ids, cents))
}
