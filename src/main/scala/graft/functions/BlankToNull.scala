package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Ruby blank?/presence (`mapper.rb:190`) as ONE single-evaluation call:
  * null / empty / space-only → null; otherwise the value itself
  * (`strip = false`, the `presence()` contract) or its space-trimmed
  * form (`strip = true`, the M13 default-normalise contract
  * `presence(trim(v))`).
  *
  * Why native: the Column rendering
  * `when(c.isNull || trim(c) === "", null).otherwise(c)` references its
  * argument THREE times, and Spark's subexpression elimination does not
  * reach conditional branches — so `presence(fieldValue(...))` around a
  * default-normalised field (itself `presence(trim(raw))`) multiplied
  * into ~9 trim evaluations of the underlying cell per field (measured
  * on the n3_segments plan, r12). Here the child evaluates exactly
  * once; the blank test and trim are one byte scan (`UTF8String.trim`,
  * exactly Spark's `trim()` — 0x20 only — so semantics are unchanged
  * and the oracle rows stay green). */
case class BlankToNull(child: Expression, strip: Boolean)
    extends UnaryExpression {

  override def prettyName: String = "graft_blank_to_null"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    BlankToNull.blankToNull(input.asInstanceOf[UTF8String], strip)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val result = nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.BlankToNull.blankToNull($s, $strip);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    result
  }

  override protected def withNewChildInternal(newChild: Expression): BlankToNull =
    copy(child = newChild)
}

object BlankToNull {

  /** Null for blank; else the (optionally trimmed) value.
    * (Named distinctly from Expression.eval: Scala emits NO static
    * forwarder for a companion method whose name the class inherits,
    * so codegen calling `BlankToNull.eval(UTF8String,...)` failed to
    * janino-compile and silently demoted every containing stage to
    * the interpreted path — found r13.) */
  def blankToNull(input: UTF8String, strip: Boolean): UTF8String = {
    val t = input.trim()
    if (t.numBytes() == 0) null
    else if (strip) t
    else input
  }

  /** `presence(c)` — blank → null, value otherwise. */
  def presence(c: Column): Column =
    GraftColumnBridge.column(BlankToNull(GraftColumnBridge.expression(c), strip = false))

  /** `presence(trim(c))` — the M13 default normalise. */
  def stripPresence(c: Column): Column =
    GraftColumnBridge.column(BlankToNull(GraftColumnBridge.expression(c), strip = true))
}
