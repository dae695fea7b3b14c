package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local lattice kernels for unigram-LM (SentencePiece-style)
  * tokenizer training and encoding (Kudo 2018, "Subword Regularization").
  * Each word's segmentation lattice has one node per code-point boundary
  * and one edge per vocabulary piece occurrence (length ≤ `maxLen`), so
  * the E-step forward–backward and the Viterbi decode are O(len · maxLen)
  * loops over small local arrays — the whole EM training loop stays one
  * narrow projection + one bounded aggregate per iteration, and encoding
  * is shuffle-free.
  *
  * Determinism contracts shared with the DuckDB oracle twins: forward
  * sums accumulate pieces in ASCENDING length order, backward likewise;
  * each expected-count term is evaluated `((freq · f_i) · p) · b_j / Z`
  * left to right; Viterbi stores CUMULATIVE scores rounded to 6 dp and
  * breaks ties toward the LONGEST piece. The piece tables are plan
  * literals (`addReferenceObj`) — O(vocab) driver state, the
  * centroid/codebook convention — and every kernel is a single static
  * call so generated code stays one line regardless of vocabulary size
  * (the BpeSegment lesson: no K-proportional codegen). */
object UnigramLattice {

  /** Code-point boundary offsets of `w`: positions 0..n as Java-char
    * indices, so `w.substring(off(i), off(j))` is the piece spanning
    * lattice nodes i..j (surrogate pairs stay whole — the charsToRepr
    * contract). */
  private def boundaries(w: String): Array[Int] = {
    val off = new Array[Int](w.codePointCount(0, w.length) + 1)
    var i = 0
    var n = 0
    while (i < w.length) {
      off(n) = i
      i += Character.charCount(w.codePointAt(i))
      n += 1
    }
    off(n) = w.length
    off
  }

  /** All substrings of 1..maxLen code points, WITH multiplicity —
    * the seed-candidate enumeration. */
  def substrings(word: UTF8String, maxLen: Int): ArrayData = {
    val w = word.toString
    val off = boundaries(w)
    val n = off.length - 1
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      var l = 1
      while (l <= maxLen && i + l <= n) {
        out.add(UTF8String.fromString(w.substring(off(i), off(i + l))))
        l += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** E-step expected piece counts of ONE word under the current model:
    * forward–backward over the lattice, one (piece, freq·f_i·p·b_j/Z)
    * row per edge — the aggregate outside sums them per piece. Empty
    * when the word is unsegmentable under the model (cannot happen
    * while the single-character pieces are in the vocabulary). */
  def eStep(word: UTF8String, freq: Long,
            pieces: java.util.HashMap[String, java.lang.Double],
            maxLen: Int): ArrayData = {
    val w = word.toString
    val off = boundaries(w)
    val n = off.length - 1
    val f = new Array[Double](n + 1)
    f(0) = 1.0
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= maxLen && l <= j) {
        val p = pieces.get(w.substring(off(j - l), off(j)))
        if (p != null) f(j) += f(j - l) * p.doubleValue()
        l += 1
      }
      j += 1
    }
    val z = f(n)
    if (z == 0.0) return new GenericArrayData(Array.empty[Any])
    val b = new Array[Double](n + 1)
    b(n) = 1.0
    var i = n - 1
    while (i >= 0) {
      var l = 1
      while (l <= maxLen && i + l <= n) {
        val p = pieces.get(w.substring(off(i), off(i + l)))
        if (p != null) b(i) += p.doubleValue() * b(i + l)
        l += 1
      }
      i -= 1
    }
    val fd = freq.toDouble
    val out = new java.util.ArrayList[Any]()
    i = 0
    while (i < n) {
      var l = 1
      while (l <= maxLen && i + l <= n) {
        val piece = w.substring(off(i), off(i + l))
        val p = pieces.get(piece)
        if (p != null) {
          val c = fd * f(i) * p.doubleValue() * b(i + l) / z
          out.add(new GenericInternalRow(
            Array[Any](UTF8String.fromString(piece), c)))
        }
        l += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Viterbi best segmentation of ONE word: maximise the summed piece
    * log-probability, cumulative scores ROUNDED to 6 dp at every node
    * (so the cross-engine trajectories are bit-aligned), ties broken
    * toward the LONGEST piece. A single character absent from the
    * vocabulary scores `oovLp` (and encodes as −1 downstream), so every
    * word segments. */
  def viterbi(word: UTF8String,
              logp: java.util.HashMap[String, java.lang.Double],
              maxLen: Int, oovLp: Double): ArrayData = {
    val w = word.toString
    val off = boundaries(w)
    val n = off.length - 1
    val best = new Array[Double](n + 1)
    val choice = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      best(j) = Double.NegativeInfinity
      var l = math.min(maxLen, j)
      while (l >= 1) {
        val lpBoxed = logp.get(w.substring(off(j - l), off(j)))
        val lp =
          if (lpBoxed != null) lpBoxed.doubleValue()
          else if (l == 1) oovLp
          else Double.NaN
        if (!lp.isNaN && best(j - l) != Double.NegativeInfinity) {
          val s = round6(best(j - l) + lp)
          if (s > best(j)) {
            best(j) = s
            choice(j) = l
          }
        }
        l -= 1
      }
      j += 1
    }
    var m = 0
    var k = n
    while (k > 0) { m += 1; k -= choice(k) }
    val out = new Array[Any](m)
    k = n
    var idx = m - 1
    while (k > 0) {
      out(idx) = UTF8String.fromString(w.substring(off(k - choice(k)), off(k)))
      idx -= 1
      k -= choice(k)
    }
    new GenericArrayData(out)
  }

  /** 6-dp rounding, half AWAY FROM ZERO — the convention Spark's
    * `round(x, 6)` (BigDecimal HALF_UP) and DuckDB's `round(x, 6)`
    * (std::round) share. `math.rint` (half-to-EVEN) would diverge from
    * both engines on a cumulative score landing exactly on a
    * half-microunit; allocation-free so the Viterbi inner loop stays
    * cheap. */
  private[graft] def round6(v: Double): Double =
    math.copySign(math.floor(math.abs(v) * 1e6 + 0.5), v) / 1e6

  private[functions] def toMap(
      entries: Seq[(String, Double)]): java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](entries.size * 2)
    entries.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    m
  }

  /** Column forms. */
  def wordSubstrings(c: Column, maxLen: Int): Column =
    GraftColumnBridge.column(
      WordSubstrings(GraftColumnBridge.expression(c), maxLen))

  def unigramEStep(word: Column, freq: Column,
                   pieces: Seq[(String, Double)], maxLen: Int): Column =
    GraftColumnBridge.column(UnigramEStep(
      GraftColumnBridge.expression(word), GraftColumnBridge.expression(freq),
      pieces, maxLen))

  def unigramViterbi(word: Column, logp: Seq[(String, Double)],
                     maxLen: Int, oovLp: Double): Column =
    GraftColumnBridge.column(UnigramViterbi(
      GraftColumnBridge.expression(word), logp, maxLen, oovLp))
}

/** Native seed-candidate enumeration: all 1..maxLen code-point
  * substrings of a word, with multiplicity. */
case class WordSubstrings(child: Expression, maxLen: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_word_substrings"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    UnigramLattice.substrings(input.asInstanceOf[UTF8String], maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UnigramLattice.substrings($s, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): WordSubstrings =
    copy(child = newChild)
}

/** Native E-step: (word, freq) → array of (piece, expected count) lattice
  * contributions under the plan-literal piece-probability table. */
case class UnigramEStep(left: Expression, right: Expression,
                        pieces: Seq[(String, Double)], maxLen: Int)
    extends BinaryExpression {

  override def prettyName: String = "graft_unigram_estep"

  override def dataType: DataType = ArrayType(
    new StructType().add("piece", StringType).add("c", DoubleType),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, bigint), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val table = UnigramLattice.toMap(pieces)

  override def nullSafeEval(word: Any, freq: Any): Any =
    UnigramLattice.eStep(word.asInstanceOf[UTF8String],
      freq.asInstanceOf[Long], table, maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tab = ctx.addReferenceObj("pieces", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (w, f) =>
      s"${ev.value} = graft.functions.UnigramLattice.eStep($w, $f, $tab, $maxLen);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): UnigramEStep = copy(left = newLeft, right = newRight)
}

/** Native Viterbi decode against the plan-literal log-probability table. */
case class UnigramViterbi(child: Expression, logp: Seq[(String, Double)],
                          maxLen: Int, oovLp: Double)
    extends UnaryExpression {

  override def prettyName: String = "graft_unigram_viterbi"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val table = UnigramLattice.toMap(logp)

  override def nullSafeEval(input: Any): Any =
    UnigramLattice.viterbi(input.asInstanceOf[UTF8String], table, maxLen, oovLp)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tab = ctx.addReferenceObj("logp", table, "java.util.HashMap")
    val oov = ctx.addReferenceObj("oovLp", java.lang.Double.valueOf(oovLp),
      "java.lang.Double")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UnigramLattice.viterbi($s, $tab, $maxLen, $oov.doubleValue());")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}
