package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document repetition/quality signals — the pretraining
  * filter family popularised by the Gopher/MassiveText and RefinedWeb
  * data papers (duplicate-line fraction, duplicate-line CHARACTER
  * fraction, ellipsis-line fraction, most-frequent-2-gram character
  * fraction), computed natively in a single row-local scan.
  *
  * Why a native expression and not SQL HOFs: the dup-line and top-gram
  * signals need per-document hash state (a line-frequency table, a
  * 2-gram frequency table). A HOF rendering pays interpreted lambda
  * dispatch PER ELEMENT (the repo's thrice-measured disease), and a
  * relational rendering explodes every line and 2-gram of the corpus
  * into a doc-keyed shuffle — this expression keeps the whole
  * computation inside one JVM-compiled eval per ROW with two small
  * hash maps, the [[CharScan]] argument one level up. [[doGenCode]]
  * emits one static call (separator attached via `addReferenceObj`),
  * so the scan rides whole-stage codegen like
  * [[NgramSpanHashes]]/[[TermCounts]] instead of forcing the stage to
  * fall back — the per-row work itself is the same compiled O(chars)
  * pass either way (measured delta reported in SCALING.md).
  *
  * Contracts (all deterministic, oracle-mirrorable):
  *  - lines = `sep`-split, empty lines dropped; `n_lines` is their count.
  *  - `dup_line_frac` = occurrences beyond a line value's first,
  *    divided by n_lines (0.0 when no lines) — equivalently
  *    1 − distinct/total.
  *  - `dup_line_char_frac` = the characters of those beyond-first
  *    occurrences over total line characters (0.0 when no characters).
  *  - `ellipsis_line_frac` = lines ending in "..." or "…" over n_lines.
  *  - `top_2gram_char_frac` = (count × gram chars incl the joining
  *    space) of the most frequent word 2-gram over the document's
  *    total chars; words are whitespace-run-split so grams span line
  *    breaks; ties break to the lexicographically smallest gram (by
  *    Java/UTF-16 ordering, which agrees with DuckDB's byte order on
  *    ASCII corpora); 0.0 under two words.
  */
case class GopherScan(child: Expression, sep: String)
    extends UnaryExpression {

  override def prettyName: String = "graft_gopher_scan"

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("ellipsis_line_frac", DoubleType, nullable = false),
    StructField("top_2gram_char_frac", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else if (sep.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName separator must be non-empty")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    GopherScan.scan(input.asInstanceOf[UTF8String], sep)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, "java.lang.String")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.GopherScan.scan($s, $sepRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherScan =
    copy(child = newChild)
}

object GopherScan {
  /** Column form. */
  def gopherScan(c: Column, sep: String): Column =
    GraftColumnBridge.column(GopherScan(GraftColumnBridge.expression(c), sep))

  /** The one-pass scan — static so generated code calls it directly. */
  def scan(input: UTF8String, sep: String): GenericInternalRow = {
    val text = input.toString
    // --- line signals ---------------------------------------------------
    var nLines = 0
    var dupLines = 0
    var dupChars = 0L
    var lineChars = 0L
    var ellipsis = 0
    val seen = new java.util.HashSet[String]()
    var from = 0
    var done = false
    while (!done) {
      val at = text.indexOf(sep, from)
      val end = if (at < 0) text.length else at
      if (end > from) {
        val line = text.substring(from, end)
        nLines += 1
        lineChars += line.length
        if (!seen.add(line)) { dupLines += 1; dupChars += line.length }
        if (line.endsWith("...") || line.endsWith("…")) ellipsis += 1
      }
      if (at < 0) done = true else from = at + sep.length
    }
    // --- top word-2-gram ------------------------------------------------
    // words = whitespace-run split (so grams cross line breaks); the gram
    // frequency table keys on "wordA wordB"
    val counts = new java.util.HashMap[String, Int]()
    var bestCount = 0
    var bestGram: String = null
    var prev: String = null
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      var j = i
      while (j < n && !isWs(text.charAt(j))) j += 1
      if (j > i) {
        val w = text.substring(i, j)
        if (prev != null) {
          val gram = prev + " " + w
          val c = counts.merge(gram, 1, Integer.sum)
          if (c > bestCount || (c == bestCount && gram.compareTo(bestGram) < 0)) {
            bestCount = c; bestGram = gram
          }
        }
        prev = w
      }
      i = j
    }
    val dupLineFrac = if (nLines == 0) 0.0 else dupLines.toDouble / nLines
    val dupCharFrac = if (lineChars == 0L) 0.0 else dupChars.toDouble / lineChars
    val ellipsisFrac = if (nLines == 0) 0.0 else ellipsis.toDouble / nLines
    val topFrac =
      if (bestGram == null || n == 0) 0.0
      else bestCount.toDouble * bestGram.length / n
    new GenericInternalRow(Array[Any](
      nLines, dupLineFrac, dupCharFrac, ellipsisFrac, topFrac))
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\n' || c == '\t' || c == '\r'
}
