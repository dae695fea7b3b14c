package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashing-trick document embedding (Weinberger et al. 2009, "Feature
  * Hashing for Large Scale Multitask Learning"): every hashed
  * unigram+bigram feature adds ±1 to ONE of `dim` components —
  * index = `h32(f) % dim`, sign = bit 31 of the SAME h32 (the
  * one-hash index/sign split; the high bit is independent of the
  * low-bits index for md5) — then the vector is L2-normalised. The
  * result is a cheap, deterministic, vocabulary-free dense embedding
  * whose cosine approximates token-multiset similarity, which is
  * exactly the contract the downstream stack needs: the output column
  * drops straight into [[graft.operators.Ann]]'s brute/LSH/IVF/PQ
  * searchers and `semDedup` — raw text becomes ANN-searchable without
  * any external model.
  *
  * One native row-local pass (the [[HashedNgramScore]] shape: same
  * tokenizer — whitespace runs, ROOT lowercase — same h32, one static
  * call from generated code); no token explode, no per-doc aggregate,
  * zero shuffle. A document with no tokens returns the zero vector
  * (callers selecting for ANN should filter token-less docs on the
  * INPUT side — e.g. `text rlike "[^ \n\t\r]"` — not on a computed
  * column, which would re-evaluate the scan). */
case class HashedEmbedding(child: Expression, dim: Int, bigrams: Boolean = true)
    extends UnaryExpression {

  override def prettyName: String = "graft_hashed_embedding"

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else if (dim < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs dim >= 1, got $dim")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    HashedEmbedding.embed(input.asInstanceOf[UTF8String], dim, bigrams)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedEmbedding.embed($s, $dim, $bigrams);")

  override protected def withNewChildInternal(newChild: Expression): HashedEmbedding =
    copy(child = newChild)
}

object HashedEmbedding {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\n' || c == '\t' || c == '\r'

  def embed(input: UTF8String, dim: Int, bigrams: Boolean): ArrayData = {
    val text = input.toString
    val v = new Array[Double](dim)
    var prev: String = null
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      var j = i
      while (j < len && !isWs(text.charAt(j))) j += 1
      if (j > i) {
        val w = text.substring(i, j).toLowerCase(java.util.Locale.ROOT)
        add(v, HashedNgramScore.h32(w), dim)
        if (bigrams && prev != null)
          add(v, HashedNgramScore.h32(prev + " " + w), dim)
        prev = w
      }
      i = j
    }
    var ss = 0.0
    var k = 0
    while (k < dim) { ss += v(k) * v(k); k += 1 }
    if (ss > 0) {
      val n = math.sqrt(ss)
      k = 0
      while (k < dim) { v(k) /= n; k += 1 }
    }
    val out = new Array[Any](dim)
    k = 0
    while (k < dim) { out(k) = v(k); k += 1 }
    new GenericArrayData(out)
  }

  private def add(v: Array[Double], h: Long, dim: Int): Unit = {
    val sgn = if ((h & 0x80000000L) != 0) -1.0 else 1.0
    v((h % dim).toInt) += sgn
  }

  /** Column form. */
  def hashedEmbedding(c: Column, dim: Int, bigrams: Boolean = true): Column =
    GraftColumnBridge.column(
      HashedEmbedding(GraftColumnBridge.expression(c), dim, bigrams))
}
