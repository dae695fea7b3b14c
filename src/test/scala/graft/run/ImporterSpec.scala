package graft.run

import graft.SparkSpec
import graft.model.MappingLoader
import org.apache.spark.sql.functions._

import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** End-to-end orchestration, mirroring
  * `test/universal_importer_helper_test.rb`: container expansion, mapping
  * match, per-format read, canonical-table union. */
class ImporterSpec extends SparkSpec {

  private def tmpDir(): File = {
    val d = File.createTempFile("graft_imp", "")
    d.delete(); d.mkdirs(); d
  }

  private def write(dir: File, name: String, content: Array[Byte]): String = {
    val f = new File(dir, name)
    val os = new FileOutputStream(f)
    try os.write(content) finally os.close()
    f.getAbsolutePath
  }

  test("zip of two CSVs -> one canonical table (reference :205-223)") {
    val dir = tmpDir()
    val csv1 = "surname,forename\nSMITH,JOHN\n".getBytes("UTF-8")
    val csv2 = "surname,forename\nDOE,JANE\n".getBytes("UTF-8")
    val zipPath = new File(dir, "two_files.zip").getAbsolutePath
    val z = new ZipOutputStream(new FileOutputStream(zipPath))
    z.putNextEntry(new ZipEntry("inner/first.csv")); z.write(csv1); z.closeEntry()
    z.putNextEntry(new ZipEntry("second.csv")); z.write(csv2); z.closeEntry()
    z.close()

    val mappings = MappingLoader.loadTables(
      """|- canonical_name: people
         |  filename_pattern: !ruby/regexp /\.csv\z/i
         |  header_lines: 1
         |  klass: Person
         |  columns:
         |  - column: surname
         |    mappings:
         |    - field: surname
         |  - column: forename
         |    mappings:
         |    - field: forename
         |""".stripMargin)

    val tables = Importer.mappedTables(spark, zipPath, mappings,
      Registry.ContainerOptions(unzipPath = dir.getAbsolutePath))
    assert(tables.keySet == Set("people"))
    val rows = tables("people")
      .select(element_at(col("fields"), "surname")).collect().map(_.getString(0)).sorted
    assert(rows.toSeq == Seq("DOE", "SMITH"))
  }

  test("xlsx sheets route by tablename_pattern") {
    val dir = tmpDir()
    // reuse the ExcelSpec generator shape: two sheets, only Sheet1 mapped
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    entry("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Data" sheetId="1" r:id="rId1"/>
        |<sheet name="Notes" sheetId="2" r:id="rId2"/></sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="x" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="str"><v>code</v></c></row>
        |<row r="2"><c r="A2"><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    entry("xl/worksheets/sheet2.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="str"><v>ignore me</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    val xlsxPath = write(dir, "book.xlsx", bos.toByteArray)

    val mappings = MappingLoader.loadTables(
      """|- canonical_name: codes
         |  filename_pattern: !ruby/regexp /\.xlsx\z/i
         |  tablename_pattern: !ruby/regexp /\ADat/
         |  header_lines: 1
         |  klass: Code
         |  columns:
         |  - column: code
         |    mappings:
         |    - field: code
         |""".stripMargin)

    val tables = Importer.mappedTables(spark, xlsxPath, mappings)
    val rows = tables("codes")
      .select(element_at(col("fields"), "code")).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("42"))
  }

  test("jsonl object rows map by column name") {
    val dir = tmpDir()
    val path = write(dir, "data.jsonl",
      "{\"text\": \"Hello\"}\n{\"text\": \"World\"}\n".getBytes("UTF-8"))
    val mappings = MappingLoader.loadTables(
      """|- canonical_name: texts
         |  filename_pattern: !ruby/regexp /\.jsonl\z/i
         |  klass: Doc
         |  columns:
         |  - column: text
         |    mappings:
         |    - field: text
         |""".stripMargin)
    val tables = Importer.mappedTables(spark, path, mappings)
    val rows = tables("texts")
      .select(element_at(col("fields"), "text")).collect().map(_.getString(0)).sorted
    assert(rows.toSeq == Seq("Hello", "World"))
  }

  test("7z container expands via commons-compress") {
    val dir = tmpDir()
    val szPath = new File(dir, "arch.7z").getAbsolutePath
    val sz = new org.apache.commons.compress.archivers.sevenz.SevenZOutputFile(new File(szPath))
    val e = sz.createArchiveEntry(new File("/dev/null"), "inner.csv")
    sz.putArchiveEntry(e)
    sz.write("a\n1\n".getBytes("UTF-8"))
    sz.closeArchiveEntry()
    sz.close()
    val files = Registry.files(szPath,
      Registry.ContainerOptions(unzipPath = dir.getAbsolutePath))
    assert(files.length == 1 && files.head.endsWith("inner.csv"))
  }
}
