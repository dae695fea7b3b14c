package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE segmentation of ONE word: frame the word's code points,
  * apply the trained merge list rank by rank (each rank replaces all
  * non-overlapping adjacent (l, r) pairs left to right — exactly the
  * literal-`replace` semantics of [[graft.operators.TextStats.bpeTrain]]'s
  * training loop, which is the parity contract), and return the symbol
  * array.
  *
  * Why native — and what the A/B actually showed: the composable
  * rendering runs, PER WORD ROW, one `regexp_replace` (char framing),
  * K chained `UTF8String.replace` calls, and one `regexp_extract_all`
  * (symbol split). At the oracle's K = 16 the swap measured PARITY
  * (21.6 vs 20.3 s at sf10, within run noise — `x_bpe_encode`'s cost
  * is the ~114M-symbol posexplode + vocab join, not the string ops;
  * SCALING.md records the refuted hypothesis). The expression earns
  * its place STRUCTURALLY: a production tokenizer carries ~32k merges,
  * and a 32k-deep chained-replace projection cannot compile (the
  * janino 64 KB / K-proportional-codegen ceiling, the r10/r11
  * expression-ladder disease) — it would fall back to interpreted
  * eval, paying 32k virtual calls per word. Here K affects only the
  * size of the `addReferenceObj` merge table (O(K) driver state, the
  * centroid convention) while generated code stays one static call,
  * so the encode path survives real vocabulary sizes unchanged.
  * Training keeps the replace chain: it applies ONE new merge per
  * iteration incrementally (K total scans); re-segmenting from
  * scratch each iteration would be O(K²).
  *
  * Rank order preserves the BPE invariant that applying the full
  * ordered list from scratch equals the training loop's incremental
  * application (BpeSpec pins the parity on randomized merge-dense
  * words plus multi-code-point characters). */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def prettyName: String = "graft_bpe_segment"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val table: Array[Array[String]] =
    merges.map(m => Array(m._1, m._2)).toArray

  override def nullSafeEval(input: Any): Any =
    BpeSegment.segment(input.asInstanceOf[UTF8String], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tab = ctx.addReferenceObj("merges", table, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BpeSegment.segment($s, $tab);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

object BpeSegment {

  def segment(word: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val w = word.toString
    // initial symbols: one per code point (the charsToRepr contract —
    // Java regex '.' matches a code point, surrogate pairs stay whole)
    var syms = new Array[String](w.length)
    var n = 0
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val cc = Character.charCount(cp)
      syms(n) = w.substring(i, i + cc)
      n += 1
      i += cc
    }
    var m = 0
    while (m < merges.length && n > 1) {
      val l = merges(m)(0)
      val r = merges(m)(1)
      var out = 0
      var j = 0
      while (j < n) {
        if (j + 1 < n && syms(j) == l && syms(j + 1) == r) {
          syms(out) = l + r
          j += 2
        } else {
          syms(out) = syms(j)
          j += 1
        }
        out += 1
      }
      n = out
      m += 1
    }
    val arr = new Array[Any](n)
    var k = 0
    while (k < n) { arr(k) = UTF8String.fromString(syms(k)); k += 1 }
    new GenericArrayData(arr)
  }

  /** Column form. */
  def bpeSegment(c: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeSegment(GraftColumnBridge.expression(c), merges))
}
