package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The non-tabular cell capture chain
  * (`non_tabular/record.rb:84-99`) fused into ONE native call: apply
  * the Java-translated Ruby capture patterns sequentially (nil -> ""
  * between patterns, group 1 on match, null on miss), Ruby-strip the
  * survivor (all `\s` plus NUL, both ends), and blank-collapse to ""
  * — exactly the composed rendering
  * `when(keep, capture(...)).otherwise("")` used by the single-line
  * fast path in [[graft.tabulate.NonTabular.cellExpr]].
  *
  * Why fused: the composed rendering repeats the full
  * rlike→regexp_extract→regexp_replace chain in FOUR positions (the
  * null test, the blank test, and both CASE branches), and Spark's
  * subexpression elimination does not reach inside conditional
  * branches — ~7 regex executions per cell per record where one
  * `Matcher.find` per pattern suffices. Here each pattern runs exactly
  * once (compiled once per instance, attached to the generated code
  * via `addReferenceObj`) and the strip is a char scan, not a regex.
  * Never null: a missing line (null input), failed capture, or blank
  * survivor all yield "" — the contract the NonTabularSpec goldens and
  * the `n3_segments` oracle pin. */
case class CaptureChain(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def prettyName: String = "graft_capture_chain"
  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val compiled: Array[java.util.regex.Pattern] =
    patterns.map(java.util.regex.Pattern.compile).toArray

  // null-TOLERANT, not null-safe: a missing line (null element) runs the
  // chain from the empty-coalesce state and yields "", like the rendering
  override def eval(input: InternalRow): Any =
    CaptureChain.capture(child.eval(input).asInstanceOf[UTF8String], compiled)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pats = ctx.addReferenceObj("patterns", compiled, "java.util.regex.Pattern[]")
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          UTF8String ${ev.value} = graft.functions.CaptureChain.capture(
            ${c.isNull} ? null : ${c.value}, $pats);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CaptureChain =
    copy(child = newChild)
}

object CaptureChain {

  /** Ruby strip's character class as the compiled regex renders it:
    * `\s` (space, tab, LF, vertical tab, FF, CR) plus NUL. */
  private def isStrip(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
      ch == '\f' || ch == '\r' || ch == '\u0000'

  def capture(input: UTF8String, patterns: Array[java.util.regex.Pattern]): UTF8String = {
    var v: String = if (input == null) null else input.toString
    var i = 0
    while (i < patterns.length) {
      val s = if (v == null) "" else v
      val m = patterns(i).matcher(s)
      v =
        if (m.find()) { val g = m.group(1); if (g == null) "" else g }
        else null
      i += 1
    }
    if (v == null) UTF8String.EMPTY_UTF8
    else {
      var a = 0
      var b = v.length
      while (a < b && isStrip(v.charAt(a))) a += 1
      while (b > a && isStrip(v.charAt(b - 1))) b -= 1
      if (a == 0 && b == v.length) UTF8String.fromString(v)
      else UTF8String.fromString(v.substring(a, b))
    }
  }

  /** Column form. */
  def captureChain(c: Column, patterns: Seq[String]): Column =
    GraftColumnBridge.column(CaptureChain(GraftColumnBridge.expression(c), patterns))
}
