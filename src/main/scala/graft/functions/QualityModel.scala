package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Learned quality-filter INFERENCE: a hashed-ngram linear text
  * classifier scored in one native row-local pass — the public fastText
  * supervised formulation (Joulin et al. 2016, "Bag of Tricks for
  * Efficient Text Classification"): features are the document's
  * lowercased whitespace tokens plus adjacent word bigrams, each hashed
  * into one of `weights.length` buckets, and the document's logit is
  * `bias + mean(weights[bucket])` (mean, not sum — fastText averages
  * the bag, which keeps the logit length-invariant). The caller applies
  * the sigmoid; a zero-token document scores the bias alone.
  *
  * The feature hash is the house h32 (first 8 md5 hex chars of the
  * UTF-8 feature bytes as a long — `conv(substring(md5(f),1,8),16,10)`)
  * mod the table size, so another engine reproduces bucket assignment
  * exactly and the whole scorer is oracle-checkable.
  *
  * Why native: the weight table lives in the expression as a plan
  * literal (the centroid/codebook convention — a fastText-scale table
  * of 2M buckets is 16 MB, broadcast-with-the-plan territory) and is
  * probed once per feature in a single pass over the row's bytes — no
  * token explode, no weight-table join, zero shuffle. The relational
  * rendering explodes every corpus token+bigram into a group-by (the
  * same disease as the Gopher/lexicon scans, measured in SCALING.md);
  * the HOF rendering pays an interpreted lambda dispatch per feature.
  * Codegen: [[doGenCode]] emits a static call with the weight table
  * attached via `addReferenceObj`, keeping the scan inside
  * whole-stage codegen.
  *
  * Output struct: (`n_features` int, `logit` double). Tokenisation
  * matches [[LexiconScan]]: whitespace runs (space/newline/tab/CR),
  * root-locale lowercase. */
case class HashedNgramScore(child: Expression, weights: Seq[Double],
                            bias: Double, bigrams: Boolean = true)
    extends UnaryExpression {

  override def prettyName: String = "graft_hashed_ngram_score"

  override def dataType: DataType = StructType(Seq(
    StructField("n_features", IntegerType, nullable = false),
    StructField("logit", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else if (weights.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs a non-empty weight table")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val table: Array[Double] = weights.toArray

  override def nullSafeEval(input: Any): Any =
    HashedNgramScore.score(input.asInstanceOf[UTF8String], table, bias, bigrams)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tab = ctx.addReferenceObj("weights", table, "double[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedNgramScore.score($s, $tab, $bias, $bigrams);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedNgramScore =
    copy(child = newChild)
}

object HashedNgramScore {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** h32 of a string's UTF-8 bytes — first 4 md5 bytes, big-endian. */
  private[functions] def h32(s: String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\n' || c == '\t' || c == '\r'

  def score(input: UTF8String, weights: Array[Double], bias: Double,
            bigrams: Boolean): GenericInternalRow = {
    val text = input.toString
    val b = weights.length
    var n = 0
    var sum = 0.0
    var prev: String = null
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      var j = i
      while (j < len && !isWs(text.charAt(j))) j += 1
      if (j > i) {
        val w = text.substring(i, j).toLowerCase(java.util.Locale.ROOT)
        sum += weights((h32(w) % b).toInt)
        n += 1
        if (bigrams && prev != null) {
          sum += weights((h32(prev + " " + w) % b).toInt)
          n += 1
        }
        prev = w
      }
      i = j
    }
    val logit = if (n == 0) bias else bias + sum / n
    new GenericInternalRow(Array[Any](n, logit))
  }

  /** Column form. */
  def hashedNgramScore(c: Column, weights: Seq[Double], bias: Double,
                       bigrams: Boolean = true): Column =
    GraftColumnBridge.column(
      HashedNgramScore(GraftColumnBridge.expression(c), weights, bias, bigrams))
}
