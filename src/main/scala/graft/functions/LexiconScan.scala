package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Blocklist/lexicon hit counting — the C4-style "bad words" gate: how
  * many of a document's whitespace-run tokens appear in a fixed term
  * list, counted both as total occurrences and as distinct terms hit.
  * Matching is case-insensitive (tokens lowercased with the root
  * locale; terms pre-lowercased at construction) and WORD-boundary by
  * construction — a term matches whole tokens only, never substrings
  * (so a list entry "ass" does not flag "passage", the classic C4
  * false-positive the substring rendering suffers).
  *
  * Why native: the lexicon lives in the expression as a plan literal
  * (the repo's centroid/codebook convention — fine into the tens of
  * thousands of terms) and becomes ONE hash set per task, probed once
  * per token in a single row-local pass. The SQL renderings both lose
  * at scale: `size(filter(toks, t -> array_contains(lex, t)))` is an
  * interpreted per-element lambda over an O(L) array probe, and the
  * relational rendering explodes every corpus token into a join. A
  * single-word term list is the contract; multi-word phrases belong to
  * [[graft.operators.TextDedup.sharedNgramSpans]]-style window machinery,
  * not this scan. */
case class LexiconScan(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def prettyName: String = "graft_lexicon_scan"

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_hits", IntegerType, nullable = false),
    StructField("n_terms_hit", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else if (terms.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs a non-empty term list")
    else {
      // The scan matches whole whitespace-delimited tokens, so a term
      // containing whitespace (or an empty term) can NEVER match — fail
      // at analysis instead of silently under-counting (ADVICE r11).
      val bad = terms.filter(t => t.isEmpty || t.exists(LexiconScan.isWs))
      if (bad.nonEmpty)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName terms must be non-empty single words (no " +
          s"whitespace) — a multi-word phrase can never match one token; " +
          s"got: ${bad.take(5).map(t => s"'$t'").mkString(", ")}")
      else TypeCheckResult.TypeCheckSuccess
    }

  // built once per deserialized instance (per task), probed per token
  @transient private lazy val termSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](terms.size * 2)
    terms.foreach(t => s.add(t.toLowerCase(java.util.Locale.ROOT)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    LexiconScan.scan(input.asInstanceOf[UTF8String], termSet)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the per-task term set rides the references array — built once on
    // the driver, probed per token in generated code
    val setRef = ctx.addReferenceObj("termSet", termSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.LexiconScan.scan($s, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconScan =
    copy(child = newChild)
}

object LexiconScan {
  /** Column form. */
  def lexiconScan(c: Column, terms: Seq[String]): Column =
    GraftColumnBridge.column(LexiconScan(GraftColumnBridge.expression(c), terms))

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\n' || c == '\t' || c == '\r'

  /** The one-pass scan — static so generated code calls it directly. */
  def scan(input: UTF8String, termSet: java.util.HashSet[String]): GenericInternalRow = {
    val text = input.toString
    var nTokens = 0
    var nHits = 0
    val hit = new java.util.HashSet[String]()
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      var j = i
      while (j < n && !isWs(text.charAt(j))) j += 1
      if (j > i) {
        nTokens += 1
        val w = text.substring(i, j).toLowerCase(java.util.Locale.ROOT)
        if (termSet.contains(w)) { nHits += 1; hit.add(w) }
      }
      i = j
    }
    new GenericInternalRow(Array[Any](nTokens, nHits, hit.size))
  }
}
