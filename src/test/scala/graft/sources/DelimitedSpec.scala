package graft.sources

import graft.SparkSpec
import graft.model.TableMapping
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Ported from `test/file/delimited_test.rb` + the encoding corpus
  * (`test/file/text_test.rb`, FIXTURES.md §1): delimiters, BOM, UTF-16,
  * Windows-1252, liberal parsing, strict row-numbered failures. */
class DelimitedSpec extends SparkSpec {

  private val az = ('A' to 'Z').map(_.toString)
  private def azCsv(sep: String) =
    (az.mkString(sep) + "\n" + Seq.fill(26)("1").mkString(sep) + "\n" +
      Seq.fill(26)("2").mkString(sep) + "\n")

  private def writeTmp(name: String, bytes: Array[Byte]): String = {
    val dir = Files.createTempDirectory("delim")
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p.toString
  }

  private def mapping(sep: String, liberal: Boolean = false) =
    TableMapping(delimiter = Some(sep), liberalParsing = liberal,
      columns = Seq.fill(26)(graft.model.ColumnMapping()))

  private def readRows(path: String, sep: String, liberal: Boolean = false): Seq[Seq[String]] =
    Tabular.delimited(spark, Seq(path), mapping(sep, liberal))
      .orderBy("lineno").select("cells").collect()
      .map(_.getSeq[String](0).toSeq).toSeq

  test("normal csv: A..Z header and rows") {
    val p = writeTmp("normal.csv", azCsv(",").getBytes("UTF-8"))
    val rows = readRows(p, ",")
    assert(rows(0) == az)
    assert(rows(1) == Seq.fill(26)("1"))
    assert(rows(2) == Seq.fill(26)("2"))
  }

  test("pipe and thorn delimiters") {
    val pipe = writeTmp("normal_pipe.csv", azCsv("|").getBytes("UTF-8"))
    assert(readRows(pipe, "|")(1) == Seq.fill(26)("1"))
    // thorn: 0xFE byte in windows-1252 → 'þ' after the encoding probe
    val thorn = writeTmp("normal_thorn.csv",
      azCsv("þ").getBytes("windows-1252"))
    assert(readRows(thorn, "þ")(1) == Seq.fill(26)("1"))
  }

  test("UTF-8 BOM is stripped; UTF-16LE/BE decoded via probe") {
    val bom = writeTmp("bomd.csv",
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ azCsv(",").getBytes("UTF-8"))
    assert(readRows(bom, ",")(0) == az)

    val utf16le = writeTmp("utf16le.csv",
      Array[Byte](0xFF.toByte, 0xFE.toByte) ++ azCsv(",").getBytes("UTF-16LE"))
    assert(readRows(utf16le, ",")(0) == az)

    val utf16be = writeTmp("utf16be.csv",
      Array[Byte](0xFE.toByte, 0xFF.toByte) ++ azCsv(",").getBytes("UTF-16BE"))
    assert(readRows(utf16be, ",")(2) == Seq.fill(26)("2"))
  }

  test("windows-1252 bytes fall back after failed UTF-8 probe") {
    val content = "name,town\nBob,Saundersfoot\nAnn,Abergeleÿ\n" // ÿ
    val p = writeTmp("windows.csv", content.getBytes("windows-1252"))
    val rows = Tabular.delimited(spark, Seq(p),
        TableMapping(delimiter = Some(","),
          columns = Seq.fill(2)(graft.model.ColumnMapping())))
      .orderBy("lineno").select("cells").collect().map(_.getSeq[String](0))
    assert(rows(2) == Seq("Ann", "Abergeleÿ"))
  }

  test("liberal parsing keeps unescaped quotes as text") {
    val content = az.mkString(",") + "\n" + Seq.fill(26)("1").mkString(",") + "\n" +
      (Seq.fill(25)("2") :+ "2\"malformed\"").mkString(",") + "\n"
    val p = writeTmp("malformed.csv", content.getBytes("UTF-8"))
    val rows = readRows(p, ",", liberal = true)
    assert(rows(2).sorted == (Seq.fill(25)("2") :+ "2\"malformed\"").sorted)
  }

  test("embedded newlines inside quoted fields stay in their record") {
    val content = "name,notes\nBob,\"line one\nline two\"\nAnn,plain\n"
    val p = writeTmp("embedded.csv", content.getBytes("UTF-8"))
    val rows = Tabular.delimited(spark, Seq(p),
        TableMapping(delimiter = Some(","),
          columns = Seq.fill(2)(graft.model.ColumnMapping())))
      .orderBy("lineno").select("cells").collect().map(_.getSeq[String](0))
    assert(rows.length == 3)
    assert(rows(1) == Seq("Bob", "line one\nline two"))
    assert(rows(2) == Seq("Ann", "plain"))
  }

  test("illegal quoting fails unconditionally with the reference's row-numbered message") {
    // `delimited_test.rb` malformed.csv: the import aborts on the first bad
    // row unless liberal_parsing is set — no opt-in strict mode.
    val content = az.mkString(",") + "\n" + Seq.fill(26)("1").mkString(",") + "\n" +
      (Seq.fill(25)("2") :+ "2\"malformed\"").mkString(",") + "\n"
    val p = writeTmp("malformed.csv", content.getBytes("UTF-8"))
    val ex = intercept[Exception] {
      readRows(p, ",")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("Invalid CSV format on row 3 of malformed.csv")))
  }
}
