package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** Binary-document text extraction (M3 `decode: :word_doc`, S13/S14 Word
  * readers — reference `lib/ndr_import/mapper.rb:281-311`,
  * `lib/ndr_import/file/{word,docx}.rb`).
  *
  * .docx is extracted for real: it is a zip of XML, so `word/document.xml`
  * is parsed and `<w:p>` paragraphs joined with newlines — pure JDK, no
  * external library. Legacy OLE .doc has no parser in this environment, so
  * its extraction is a clearly-marked STUB: printable text runs are scraped
  * deterministically from the binary (enough to keep the Spark plumbing —
  * schema, UDF signature, per-file partitioning — real and testable).
  */
object BinaryDecode {

  private val OleMagic = Array[Byte](0xD0.toByte, 0xCF.toByte, 0x11, 0xE0.toByte)

  def extractWordText(bytes: Array[Byte]): String = extractWordText(bytes, None)

  def extractWordText(bytes: Array[Byte], password: Option[String]): String = {
    if (bytes == null || bytes.isEmpty) return null
    if (bytes.length >= 4 && bytes.take(4).sameElements(OleMagic)) {
      if (OoxmlCrypto.isEncrypted(bytes)) password match {
        case Some(pw) => extractDocx(OoxmlCrypto.decrypt(bytes, pw))
        case None     => sys.error("Document is password protected (set file_password)")
      }
      else extractDocStub(bytes)
    }
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == 'K') extractDocx(bytes)
    else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Real .docx extraction: unzip → parse word/document.xml → paragraphs. */
  def extractDocx(bytes: Array[Byte]): String = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .find(_.getName == "word/document.xml") match {
        case Some(_) =>
          val xml = scala.xml.XML.load(zin)
          val paras = (xml \\ "body" \ "p").map { p =>
            (p \\ "t").map(_.text).mkString
          }
          paras.mkString("\n")
        case None => sys.error("Not a .docx file (no word/document.xml)")
      }
    } finally zin.close()
  }

  /** STUB — legacy OLE .doc extraction. No .doc parser ships in this
    * environment; this deterministic fake scrapes printable ASCII runs (≥4
    * chars) so pipelines over .doc columns remain exercisable end-to-end.
    * On a real deployment, swap in Apache POI HWPF `WordExtractor` here.
    */
  def extractDocStub(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    val run = new StringBuilder
    def flush(): Unit = {
      if (run.length >= 4) { if (sb.nonEmpty) sb.append('\n'); sb.append(run) }
      run.clear()
    }
    bytes.foreach { b =>
      val c = (b & 0xFF).toChar
      if (c >= ' ' && c < 127) run.append(c) else flush()
    }
    flush()
    sb.toString
  }

  private val wordUdf = udf((b: Array[Byte]) => extractWordText(b))

  /** Column form used by the mapping compiler's decode chain. */
  def wordDocText(c: Column): Column = wordUdf(c.cast("binary"))
}
