package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.zip.Inflater
import scala.collection.mutable

/** PDF text + AcroForm extraction (S12/S15 — reference
  * `lib/ndr_import/file/pdf.rb`, `file/acro_form.rb`, `acroform_reader.rb`).
  *
  * No PDF library ships in this environment (a real deployment would use
  * PDFBox `PDFTextStripper` / `PDAcroForm`), so this is a minimal native
  * parser that covers the common case: objects scanned from the raw bytes,
  * FlateDecode streams inflated with the JDK, text drawn from `Tj`/`TJ`/`'`
  * operators (with `Td`/`TD`/`T*`/`BT` treated as line breaks), and
  * AcroForm fields scraped from `/T`/`/V` entries of Widget-bearing field
  * dicts. Exotic encodings (CID fonts, custom CMaps) are out of scope and
  * yield best-effort text — the Spark-side plumbing (binaryFile per-file
  * tasks, line rows, single Map row for forms) is the real contract.
  */
object Pdf {

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](16 * 1024)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n) else if (n == 0 && inf.needsDictionary()) return out.toByteArray
      }
      out.toByteArray
    } catch { case _: Exception => out.toByteArray }
    finally inf.end()
  }

  private def latin(bytes: Array[Byte]): String =
    new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** All decoded content streams of the document. */
  private def contentStreams(bytes: Array[Byte]): Seq[String] = {
    val raw = latin(bytes)
    val out = mutable.ArrayBuffer.empty[String]
    val streamRe = "(?s)<<(.*?)>>\\s*stream\r?\n".r
    var idx = 0
    streamRe.findAllMatchIn(raw).foreach { m =>
      val dict = m.group(1)
      val start = m.end
      val end = raw.indexOf("endstream", start)
      if (end > start) {
        val data = bytes.slice(start, end)
        val text =
          if (dict.contains("/FlateDecode")) latin(inflate(data))
          else if (dict.contains("/Filter")) "" // unsupported filter
          else latin(data)
        if (text.contains("BT") || text.contains("Tj") || text.contains("TJ"))
          out += text
      }
      idx = end
    }
    out.toSeq
  }

  private def unescapePdfString(s: String): String =
    s.replace("\\n", "\n").replace("\\r", "\r").replace("\\t", "\t")
      .replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")

  /** Extract page text lines from the text operators of content streams. */
  def extractTextLines(bytes: Array[Byte]): Seq[String] = {
    val lines = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    def flushLine(): Unit = { lines += sb.toString; sb.clear() }

    // (string) Tj | ' ;  [ (a) -250 (b) ] TJ ;  Td/TD/T* newline
    val tokenRe = ("(?s)\\(((?:[^()\\\\]|\\\\.)*)\\)\\s*(Tj|')" +
      "|\\[((?:[^\\]\\\\]|\\\\.)*)\\]\\s*TJ" +
      "|(T\\*|Td|TD|BT)").r
    contentStreams(bytes).foreach { cs =>
      tokenRe.findAllMatchIn(cs).foreach { m =>
        if (m.group(4) != null) {
          if (sb.nonEmpty) flushLine()
        } else if (m.group(1) != null) {
          if (m.group(2) == "'") { if (sb.nonEmpty) flushLine() }
          sb ++= unescapePdfString(m.group(1))
        } else if (m.group(3) != null) {
          "\\(((?:[^()\\\\]|\\\\.)*)\\)".r.findAllMatchIn(m.group(3))
            .foreach(g => sb ++= unescapePdfString(g.group(1)))
        }
      }
      if (sb.nonEmpty) flushLine()
    }
    lines.toSeq
  }

  /** S15 — AcroForm `{field name → value}` single-row hash
    * (`acroform_reader.rb:6-31`): Widget-bearing field dicts, unique names
    * enforced. */
  def acroFormFields(bytes: Array[Byte]): Map[String, String] = {
    val raw = latin(bytes)
    val out = mutable.LinkedHashMap.empty[String, String]
    // field objects: dicts containing /T (name); /V (value) optional
    val objRe = "(?s)obj\\s*<<(.*?)>>\\s*endobj".r
    val tRe = "/T\\s*\\(((?:[^()\\\\]|\\\\.)*)\\)".r
    val vRe = "/V\\s*(?:\\(((?:[^()\\\\]|\\\\.)*)\\)|/([A-Za-z0-9]+))".r
    objRe.findAllMatchIn(raw).foreach { m =>
      val dict = m.group(1)
      val isField = dict.contains("/Widget") || dict.contains("/FT") || dict.contains("/Kids")
      if (isField) {
        tRe.findFirstMatchIn(dict).foreach { tm =>
          val name = unescapePdfString(tm.group(1))
          val value = vRe.findFirstMatchIn(dict)
            .map(vm => if (vm.group(1) != null) unescapePdfString(vm.group(1)) else vm.group(2))
            .getOrElse("")
          if (out.contains(name) && out(name) != value)
            sys.error(s"Duplicate AcroForm field name: $name")
          out(name) = value
        }
      }
    }
    if (out.isEmpty) sys.error("There are no appropriate AcroFields")
    out.toMap
  }

  /** S12 — one row per text line, per file (`pdf.rb:13-33`). */
  def lines(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        extractTextLines(bytes).zipWithIndex.map { case (l, i) => (file, i.toLong, l) }
      }.toDF("file", "lineno", "line")
  }

  /** S15 — one Map row per file. */
  def acroForm(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .map { case (file, bytes) => (file, 0L, acroFormFields(bytes)) }
      .toDF("file", "lineno", "fields_hash")
  }
}
