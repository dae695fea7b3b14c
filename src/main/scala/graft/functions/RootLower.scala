package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Locale-ROOT lowercase as a native expression.
  *
  * Why native: every inference-side scan in this repo
  * ([[HashedNgramScore]], [[HashedEmbedding]], [[LexiconScan]],
  * [[QualityModel]]) lowercases tokens with
  * `String.toLowerCase(Locale.ROOT)`, but the TRAINING feature path
  * (`TextStats.hashedFeatureRows`) went through Spark's `lower()`, whose
  * non-ASCII slow path follows the default JVM locale — on a Turkish-
  * locale JVM `I` lowers to `ı` and training hashes the token into a
  * different bucket than inference reads (advisor finding, r12). This
  * expression pins BOTH paths to the identical ROOT mapping regardless
  * of JVM locale. (Residual cross-engine caveat, documented not hidden:
  * Java's ROOT lowercase is the Unicode FULL case mapping — U+0130 'İ'
  * becomes "i̇", two chars — while DuckDB's `lower()` is the simple 1:1
  * mapping; the two agree on every character the test corpora contain,
  * and agree with each other independently of machine locale.)
  *
  * ASCII fast path: byte scan, no allocation beyond the result. */
case class RootLower(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_root_lower"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    RootLower.lowerRoot(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RootLower.lowerRoot($s);")

  override protected def withNewChildInternal(newChild: Expression): RootLower =
    copy(child = newChild)
}

object RootLower {

  /** ROOT-locale lowercase; ASCII inputs take a byte-level fast path. */
  def lowerRoot(input: UTF8String): UTF8String = {
    val n = input.numBytes()
    var i = 0
    var asciiNoUpper = true
    while (asciiNoUpper && i < n) {
      val b = input.getByte(i)
      if (b < 0 || (b >= 'A' && b <= 'Z')) asciiNoUpper = false
      i += 1
    }
    if (asciiNoUpper) input
    else {
      val s = input.toString
      // all-ASCII with uppers: cheap char-array lower; else full ROOT map
      var allAscii = true
      var j = 0
      while (allAscii && j < s.length) {
        if (s.charAt(j) >= 0x80) allAscii = false
        j += 1
      }
      if (allAscii) {
        val cs = s.toCharArray
        var k = 0
        while (k < cs.length) {
          val c = cs(k)
          if (c >= 'A' && c <= 'Z') cs(k) = (c + 32).toChar
          k += 1
        }
        UTF8String.fromString(new String(cs))
      } else UTF8String.fromString(s.toLowerCase(java.util.Locale.ROOT))
    }
  }

  /** `rootLower(c)` — locale-independent lowercase. */
  def rootLower(c: Column): Column =
    GraftColumnBridge.column(RootLower(GraftColumnBridge.expression(c)))
}
