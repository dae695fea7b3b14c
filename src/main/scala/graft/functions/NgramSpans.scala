package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native windowed n-gram span hashes for exact-substring duplicate
  * detection: one pass over the row's bytes producing
  * `array<struct<start int, gram_h bigint>>` — for every window
  * position k (0-based, advancing by `stride` tokens, upper bound
  * ⌊(T−n)/stride⌋ inclusive), the struct carries the 1-based token
  * offset `k·stride + 1` and the house h32 hash (first 8 md5 hex chars
  * as a long) of the n single-space-joined tokens starting there.
  *
  * Value-identical to the composable rendering it replaces —
  * `transform(sequence(...), k -> struct(..., array_join(slice(_ws,
  * …), " ")))` + `h32` — which paid an interpreted lambda dispatch per
  * position plus an n-token array and a joined string allocation per
  * window, and (being referenced by both the frequency aggregate and
  * the scoring join) was re-planned and re-evaluated over the corpus
  * twice. Here: when the text is already canonically single-spaced
  * (no leading/trailing/double separators — checked once per row
  * during tokenisation), every window is hashed directly from the
  * row's byte range with ZERO allocation; otherwise a per-window
  * canonical buffer is built (the rare path). Rows with fewer than n
  * tokens yield an empty array (exploding to nothing — the same
  * absent-not-zero contract as the rendering's `size(_ws) >= n`
  * pre-filter). */
case class NgramSpanHashes(child: Expression, n: Int, stride: Int)
    extends UnaryExpression {

  require(n >= 1 && stride >= 1, "window and stride must be positive")

  override def prettyName: String = "graft_ngram_span_hashes"
  override def dataType: DataType = NgramSpanHashes.Out

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    NgramSpanHashes.spans(input.asInstanceOf[UTF8String], n, stride)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NgramSpanHashes.spans($s, $n, $stride);")

  override protected def withNewChildInternal(newChild: Expression): NgramSpanHashes =
    copy(child = newChild)
}

object NgramSpanHashes {

  private[functions] val Out: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("gram_h", LongType, nullable = false))),
    containsNull = false)

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** h32 of a byte range: first 4 md5 bytes, big-endian, unsigned —
    * exactly `conv(substring(md5(s), 1, 8), 16, 10)::long`. */
  private def h32(b: Array[Byte], off: Int, len: Int): Long = {
    val md = digest.get()
    md.reset()
    md.update(b, off, len)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def spans(s: UTF8String, n: Int, stride: Int): ArrayData = {
    val b = s.getBytes
    val len = b.length
    // tokenise: starts/ends (exclusive) of non-empty tokens; track
    // whether the whole row is canonically single-spaced
    var t = 0
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    var canonical = true
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || b(i) == ' ') {
        if (i > start) {
          if (t > 0 && ends(t - 1) + 1 != start) canonical = false
          starts(t) = start; ends(t) = i; t += 1
        } else canonical = false // leading, trailing or doubled separator
        start = i + 1
      }
      i += 1
    }
    if (t < n) return new GenericArrayData(Array.empty[Any])
    val count = (t - n) / stride + 1
    val out = new Array[Any](count)
    var k = 0
    while (k < count) {
      val first = k * stride
      val last = first + n - 1
      val h =
        if (canonical) h32(b, starts(first), ends(last) - starts(first))
        else {
          // canonical single-space join of the window's tokens
          var sz = n - 1
          var j = first
          while (j <= last) { sz += ends(j) - starts(j); j += 1 }
          val buf = new Array[Byte](sz)
          var p = 0
          j = first
          while (j <= last) {
            if (j > first) { buf(p) = ' '; p += 1 }
            val l = ends(j) - starts(j)
            System.arraycopy(b, starts(j), buf, p, l)
            p += l
            j += 1
          }
          h32(buf, 0, sz)
        }
      // the rendering's start is k·stride + 1 (1-based token offset)
      out(k) = new GenericInternalRow(Array[Any](first + 1, h))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column form. */
  def ngramSpanHashes(c: Column, n: Int, stride: Int): Column =
    GraftColumnBridge.column(
      NgramSpanHashes(GraftColumnBridge.expression(c), n, stride))
}
