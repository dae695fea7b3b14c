package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import scala.collection.mutable
import scala.xml.XML

/** Excel reader (S3 — reference `lib/ndr_import/file/excel.rb`).
  *
  * xlsx/xlsm are parsed for real: an .xlsx is a zip of XML parts, so the
  * workbook/sheet/sharedStrings/styles parts are read with the JDK zip
  * stream + scala-xml — no external spreadsheet library. One table per
  * worksheet (`excel.rb:20-27`), cells padded to the sheet's column span
  * (`excel.rb:66-77` first_column..last_column) and rendered with Roo's
  * exact cast rules (`excel.rb:31-50`):
  *
  *   - date-formatted numbers → `yyyy-mm-dd` (date) or
  *     `yyyy-mm-dd hh:mm:ss` (datetime) — Rails `:db` format;
  *   - whole floats → integer strings (`12` not `12.0`);
  *   - everything else → string, stripped.
  *
  * An `.xls` that is really an xlsx (zip magic) is parsed as xlsx — the
  * reference's rescue-and-retry (`excel.rb:104-115`); genuine OLE .xls goes
  * through the native BIFF8 parser ([[Biff8]]/[[Cfb]]). Password-protected
  * workbooks (OOXML agile encryption) need a crypto stack this build does
  * not implement yet and raise a clearly-marked unsupported error.
  */
object Excel {

  /** Excel serial-date epoch (1900 date system, with the Lotus leap bug —
    * serial 60 ≙ the fictitious 1900-02-29 — handled as Roo does via the
    * 1899-12-30 base). */
  private val Epoch = java.time.LocalDate.of(1899, 12, 30)

  // Builtin numFmtIds that render as dates/times (ECMA-376 §18.8.30).
  private val DateFmtIds = Set(14, 15, 16, 17, 18, 19, 20, 21, 22, 45, 46, 47)

  final case class Sheet(name: String, rows: Seq[Seq[String]])

  def isZip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == 'K'

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val out = mutable.HashMap.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  /** Does a custom format code render as a date/time? (y/m/d/h/s tokens
    * outside quoted/bracketed sections.) */
  private def isDateFormatCode(code: String): Boolean = {
    val cleaned = code
      .replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\\\\.", "")
    cleaned.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
  }

  private def castNumber(v: Double): String =
    if (v == v.floor && !v.isInfinite && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  private def castDate(serial: Double): String = {
    val days = serial.floor.toLong
    val date = Epoch.plusDays(days)
    val frac = serial - days
    if (frac == 0.0) date.toString
    else {
      val secs = math.round(frac * 86400)
      val t = java.time.LocalTime.ofSecondOfDay(secs % 86400)
      s"$date ${"%02d:%02d:%02d".format(t.getHour, t.getMinute, t.getSecond)}"
    }
  }

  /** Parse an xlsx/xlsm byte array into its sheets (cast, padded). */
  def parseXlsx(bytes: Array[Byte]): Seq[Sheet] = {
    val parts = zipEntries(bytes)
    def xml(name: String) = parts.get(name).map(b => XML.load(new ByteArrayInputStream(b)))

    val workbook = xml("xl/workbook.xml").getOrElse(sys.error("Not an xlsx: no xl/workbook.xml"))
    val rels = xml("xl/_rels/workbook.xml.rels")
      .map(r => (r \ "Relationship").map(n =>
        (n \@ "Id") -> (n \@ "Target").stripPrefix("/xl/").stripPrefix("xl/")).toMap)
      .getOrElse(Map.empty)

    val shared: IndexedSeq[String] = xml("xl/sharedStrings.xml")
      .map(ss => (ss \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq)
      .getOrElse(IndexedSeq.empty)

    // style index → is-date-format
    val styleIsDate: IndexedSeq[Boolean] = xml("xl/styles.xml").map { st =>
      val custom = (st \ "numFmts" \ "numFmt").map(n =>
        (n \@ "numFmtId").toInt -> isDateFormatCode(n \@ "formatCode")).toMap
      (st \ "cellXfs" \ "xf").map { xf =>
        val id = Option(xf \@ "numFmtId").filter(_.nonEmpty).map(_.toInt).getOrElse(0)
        DateFmtIds.contains(id) || custom.getOrElse(id, false)
      }.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

    (workbook \ "sheets" \ "sheet").map { s =>
      val name = s \@ "name"
      val rid = s.attribute("http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id")
        .map(_.text).getOrElse("")
      val target = rels.getOrElse(rid, s"worksheets/sheet1.xml")
      val sheetBytes = parts.getOrElse(s"xl/$target", sys.error(s"Missing sheet part xl/$target"))
      Sheet(name, sheetRows(sheetBytes, shared, styleIsDate))
    }
  }

  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c.toUpper - 'A' + 1))

  /** StAX (streaming) worksheet parse — memory bounded by populated cells,
    * not the sheet XML DOM; the scale path for very large sheets. */
  private def sheetRows(sheetBytes: Array[Byte], shared: IndexedSeq[String],
                        styleIsDate: IndexedSeq[Boolean]): Seq[Seq[String]] = {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(sheetBytes))

    val cells = mutable.HashMap.empty[(Int, Int), String]
    var implicitRow = 0
    var implicitCol = 0
    var cellType = ""
    var cellStyle = -1
    var inV = false
    var inIs = false
    var text = new StringBuilder
    var cellRow = 0
    var cellCol = 0

    def emit(): Unit = {
      val v = text.toString
      val value: Option[String] = cellType match {
        case "s"         => Some(shared(v.trim.toInt).trim)
        case "inlineStr" => Some(v.trim)
        case "str"       => Some(v.trim)
        case "b"         => Some(if (v.trim == "1") "true" else "false")
        case "e"         => Some(v.trim)
        case _ if v.trim.isEmpty => None
        case _ =>
          val isDate = cellStyle >= 0 && cellStyle < styleIsDate.length && styleIsDate(cellStyle)
          val d = v.trim.toDouble
          Some(if (isDate) castDate(d) else castNumber(d))
      }
      value.foreach(cells((cellRow, cellCol)) = _)
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              val ref = Option(r.getAttributeValue(null, "r")).filter(_.nonEmpty)
              implicitRow = ref.map(_.toInt).getOrElse(implicitRow + 1)
              implicitCol = 0
            case "c" =>
              val ref = Option(r.getAttributeValue(null, "r")).getOrElse("")
              implicitCol = if (ref.nonEmpty) colIndex(ref) else implicitCol + 1
              cellRow = implicitRow; cellCol = implicitCol
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cellStyle = Option(r.getAttributeValue(null, "s")).filter(_.nonEmpty)
                .map(_.toInt).getOrElse(-1)
              text = new StringBuilder
            case "v" => inV = true
            case "is" => inIs = true
            case "t" if inIs => inV = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inV) text ++= r.getText
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" if inIs => inV = false
            case "is" => inIs = false
            case "c" => emit()
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    if (cells.isEmpty) return Nil
    val rowMin = cells.keys.map(_._1).min; val rowMax = cells.keys.map(_._1).max
    val colMin = cells.keys.map(_._2).min; val colMax = cells.keys.map(_._2).max
    (rowMin to rowMax).map(rr => (colMin to colMax).map(cc => cells.get((rr, cc)).orNull))
  }

  /** Parse bytes by extension with the reference's retry semantics
    * (`excel.rb:98-115`): zip magic wins regardless of extension; genuine
    * OLE needs POI (unsupported here). */
  def parseWorkbook(fileName: String, bytes: Array[Byte],
                    password: Option[String] = None): Seq[Sheet] = {
    if (isZip(bytes)) parseXlsx(bytes)
    else if (OoxmlCrypto.isEncrypted(bytes)) password match {
      case Some(pw) => parseXlsx(OoxmlCrypto.decrypt(bytes, pw))
      case None     => sys.error(s"Unable to read the file '$fileName'; it is " +
        "password protected (set file_password)")
    }
    else if (Cfb.isCfb(bytes)) Biff8.parse(bytes)
    else sys.error(s"Unable to read the file '$fileName'")
  }

  /** One row per (file, tablename=sheet, lineno, cells) — the engine's
    * uniform tabular contract, one task per file (binaryFile). */
  def tables(spark: SparkSession, paths: Seq[String],
             password: Option[String] = None): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        parseWorkbook(file, bytes, password).flatMap { sheet =>
          sheet.rows.zipWithIndex.map { case (cells, i) =>
            (file, sheet.name, i.toLong, cells)
          }
        }
      }.toDF("file", "tablename", "lineno", "cells")
  }
}
