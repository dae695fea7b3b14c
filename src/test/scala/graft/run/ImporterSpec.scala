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

  test("bespoke not-sign delimiter through the Importer (reference :49-73)") {
    val dir = tmpDir()
    val path = write(dir, "not_sign_delimited.txt",
      "one\u00actwo\u00acthree\nsome\u00acdata\u00achere\nmore\u00acdata\u00achere\n"
        .getBytes("UTF-8"))
    val mappings = MappingLoader.loadTables(
      """|- filename_pattern: !ruby/regexp /\.txt\z/i
         |  format: delimited
         |  delimiter: "\u00ac"
         |  header_lines: 1
         |  klass: SomeTestClass
         |  columns:
         |  - column: one
         |  - column: two
         |  - column: three
         |""".stripMargin)
    val rows = Importer.mappedTables(spark, path, mappings)("")
      .orderBy("index")
      .select(element_at(col("rawtext"), "one"), element_at(col("rawtext"), "two"),
        element_at(col("rawtext"), "three"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("some", "data", "here"), ("more", "data", "here")))
  }

  test("last_data_column 'D' slices delimited + jsonl before header check") {
    val dir = tmpDir()
    val az = ('A' to 'Z').map(_.toString)
    val pipe = write(dir, "normal_pipe.csv",
      (az.mkString("|") + "\n" + Seq.fill(26)("1").mkString("|") + "\n" +
        Seq.fill(26)("2").mkString("|") + "\n").getBytes("UTF-8"))
    val mappings = MappingLoader.loadTables(
      """|- filename_pattern: !ruby/regexp /pipe/i
         |  format: delimited
         |  delimiter: '|'
         |  header_lines: 1
         |  last_data_column: D
         |  klass: SomeTestClass
         |  columns:
         |  - column: a
         |  - column: b
         |  - column: c
         |  - column: d
         |""".stripMargin)
    val rows = Importer.mappedTables(spark, pipe, mappings)("")
      .orderBy("index")
      .select(map_values(col("rawtext"))).collect().map(_.getSeq[String](0).sorted)
    assert(rows.toSeq == Seq(Seq("1", "1", "1", "1"), Seq("2", "2", "2", "2")))

    val jsonl = write(dir, "array.jsonl",
      ("[" + az.map("\"" + _ + "\"").mkString(",") + "]\n" +
        "[" + Seq.fill(26)("1").mkString(",") + "]\n" +
        "[" + Seq.fill(26)("2").mkString(",") + "]\n").getBytes("UTF-8"))
    val jm = MappingLoader.loadTables(
      """|- filename_pattern: !ruby/regexp /array/i
         |  header_lines: 1
         |  last_data_column: D
         |  klass: SomeTestClass
         |  columns:
         |  - column: a
         |  - column: b
         |  - column: c
         |  - column: d
         |""".stripMargin)
    val jrows = Importer.mappedTables(spark, jsonl, jm)("")
      .orderBy("index")
      .select(map_values(col("rawtext"))).collect().map(_.getSeq[String](0).sorted)
    assert(jrows.toSeq == Seq(Seq("1", "1", "1", "1"), Seq("2", "2", "2", "2")))
  }


  test("file_password docx through non-tabular mapping (reference :75-103)") {
    val docxPath = "/root/reference/test/resources/password_protected_hello_world.docx"
    assume(new File(docxPath).exists())
    val mappings = MappingLoader.loadTables(
      """|- file_password: salad
         |  format: docx
         |  filename_pattern: !ruby/regexp /\.docx\z/i
         |  start_line_pattern: !ruby/regexp /must not match anything a2f76abe/
         |  start_in_a_record: true
         |  end_in_a_record: true
         |  klass: SomeTestKlass
         |  columns:
         |  - column: one
         |    non_tabular_cell:
         |      lines: -1
         |      capture: !ruby/regexp /^(.*)$/i
         |""".stripMargin)
    val rows = Importer.mappedTables(spark, docxPath, mappings)("")
      .select(element_at(col("rawtext"), "one")).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("Three in fact"))
  }

  test("header validation plans a limit above the scan (no full-file pass)") {
    val rows = spark.range(100000).selectExpr(
      "'f' AS file", "id AS lineno", "array(cast(id AS string)) AS cells")
    val plan = Importer.headerFrame(rows, 2).queryExecution.executedPlan.toString
    assert(plan.contains("CollectLimit") || plan.contains("GlobalLimit"),
      s"header read must stop after header_lines rows, plan was:\n$plan")
    // and it still yields exactly the header block, in order after the sort
    val got = Importer.headerFrame(rows, 2).collect()
      .sortBy(_.getLong(1)).map(_.getLong(1)).toSeq
    assert(got == Seq(0L, 1L))
  }

  test("parquet and orc files route through the mapping pipeline (extension)") {
    val dir = tmpDir()
    import spark.implicits._
    val src = Seq(("SMITH", 42L), ("DOE", 7L)).toDF("surname", "n")
    for (fmt <- Seq("parquet", "orc")) {
      val path = new File(dir, s"people_dir_$fmt").getAbsolutePath
      src.coalesce(1).write.format(fmt).save(path)
      val dataFile = new File(path).listFiles()
        .find(f => f.getName.endsWith(s".$fmt")).get.getAbsolutePath
      // header_lines: 1 (the reference-mapping norm) must be satisfied by
      // the synthetic header row — columnar data has no header of its own
      val mappings = MappingLoader.loadTables(
        s"""|- canonical_name: people
            |  filename_pattern: !ruby/regexp /\\.$fmt\\z/i
            |  header_lines: 1
            |  klass: Person
            |  columns:
            |  - column: surname
            |    mappings:
            |    - field: surname
            |  - column: n
            |    mappings:
            |    - field: n
            |""".stripMargin)
      val rows = Importer.mappedTables(spark, dataFile, mappings)("people")
        .select(element_at(col("fields"), "surname"), element_at(col("fields"), "n"))
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
      assert(rows.toSeq == Seq(("DOE", "7"), ("SMITH", "42")), s"fmt=$fmt")
    }
  }

  test("parquet import linenos are contiguous per-file ordinals across a multi-partition scan") {
    val dir = tmpDir()
    import spark.implicits._
    val n = 200
    // one file, many row groups (tiny block size), written in id order
    val path = new File(dir, "ordinals_dir").getAbsolutePath
    (0 until n).map(i => (s"P$i", i.toLong)).toDF("surname", "n")
      .coalesce(1).write.option("parquet.block.size", 1024).parquet(path)
    val dataFile = new File(path).listFiles()
      .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // force the single file to split into several scan partitions
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      assert(spark.read.parquet(dataFile).rdd.getNumPartitions > 1,
        "fixture must scan as multiple partitions or the test is vacuous")
      val mappings = MappingLoader.loadTables(
        """|- canonical_name: people
           |  filename_pattern: !ruby/regexp /\.parquet\z/i
           |  header_lines: 1
           |  klass: Person
           |  columns:
           |  - column: surname
           |    mappings:
           |    - field: surname
           |  - column: n
           |    mappings:
           |    - field: n
           |""".stripMargin)
      val rows = Importer.mappedTables(spark, dataFile, mappings)("people")
        .select(col("index"), element_at(col("fields"), "n").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // contiguous: data rows are exactly 1..n (0 is the synthetic header)
      assert(rows.map(_._1).sorted.toSeq == (1L to n.toLong).toSeq)
      // and ordered: the ordinal follows the file's row order
      assert(rows.forall { case (idx, v) => idx == v + 1 },
        "index must be the input row number, not a gapped id")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("password-protected 7z expands with the right password, fails with the wrong one") {
    // the reference's own AES-256 fixture (test/file/seven_zip_test.rb:29-56,
    // password 'FortuneCookie', two CSVs) — commons-compress cannot WRITE
    // encrypted 7z, so the read path is pinned against this archive
    val fixture = "/root/reference/test/resources/normal.7z"
    assume(new File(fixture).exists())
    val dir = tmpDir()
    val ok = Registry.files(fixture, Registry.ContainerOptions(
      unzipPath = dir.getAbsolutePath, password = Some("FortuneCookie")))
    assert(ok.map(f => new File(f).getName).sorted ==
      Seq("normal_pipe.csv", "normal_thorn.csv"))
    intercept[Exception] {
      Registry.files(fixture, Registry.ContainerOptions(
        unzipPath = dir.getAbsolutePath, password = Some("WrongPassword")))
    }
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
