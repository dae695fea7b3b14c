package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

object ArrayMath {
  /** Column-level dot product backed by [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
