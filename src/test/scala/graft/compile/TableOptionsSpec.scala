package graft.compile

import graft.SparkSpec
import graft.model.MappingLoader
import org.apache.spark.sql.functions._

/** T5 (last_data_column), T6 (row_identifier) and S8 (xml_file_metadata
  * loading) — table-level options. */
class TableOptionsSpec extends SparkSpec {

  test("last_data_column as int and Excel letters caps the cells (T5)") {
    val m = MappingLoader.loadTable(
      """|klass: K
         |last_data_column: 2
         |columns:
         |- column: a
         |  mappings: [{field: a}]
         |- column: b
         |  mappings: [{field: b}]
         |""".stripMargin)
    assert(m.lastColumnToTransform == 1)
    val mLetters = m.copy(lastDataColumn = Some(Right("AE")))
    assert(mLetters.lastColumnToTransform == 30)

    import spark.implicits._
    val df = Seq(("f", 0L, Seq("one", "two", "three", "junk"))).toDF("file", "lineno", "cells")
    val rawtext = MappingCompiler(m).records(df)
      .select(col("rawtext")).collect().head.getMap[String, String](0)
    assert(rawtext.toMap == Map("a" -> "one", "b" -> "two"))
  }

  test("row_identifier index and uuid (T6)") {
    import spark.implicits._
    val m = MappingLoader.loadTable(
      """|klass: K
         |row_identifier: :index
         |columns:
         |- column: a
         |  mappings: [{field: a}]
         |""".stripMargin)
    val df = Seq(("f", 0L, Seq("x")), ("f", 5L, Seq("y"))).toDF("file", "lineno", "cells")
    val ids = MappingCompiler(m).records(df).orderBy("index")
      .select(element_at(col("fields"), "row_identifier")).collect().map(_.getString(0))
    assert(ids.toSeq == Seq("0", "5"))

    val mu = m.copy(rowIdentifier = Some("uuid"))
    val uuids = MappingCompiler(mu).records(df)
      .select(element_at(col("fields"), "row_identifier")).collect().map(_.getString(0))
    assert(uuids.length == 2 && uuids.forall(_.matches("[0-9a-f-]{36}")))
  }

  test("two-digit years window like Ruby strptime: 69-99 -> 19xx") {
    import graft.model.FieldMapping
    def parse(v: String, fmt: String): String =
      RowMapper.mappedValue(v, FieldMapping(field = "d", format = Some(fmt)))
    assert(parse("01/01/70", "dd/mm/yy") == "1970-01-01")
    assert(parse("01/01/99", "dd/mm/yy") == "1999-01-01")
    assert(parse("01/01/68", "dd/mm/yy") == "2068-01-01")
    assert(parse("01/01/00", "dd/mm/yy") == "2000-01-01")
    assert(parse("03/10/1978", "dd/mm/yyyy") == "1978-10-03") // yyyy untouched

    // Catalyst path agrees
    import spark.implicits._
    val m = MappingLoader.loadTable(
      """|klass: K
         |columns:
         |- column: d
         |  mappings:
         |  - field: d
         |    format: dd/mm/yy
         |""".stripMargin)
    val df = Seq(("f", 0L, Seq("01/01/70")), ("f", 1L, Seq("01/01/68")))
      .toDF("file", "lineno", "cells")
    val got = MappingCompiler(m).records(df).orderBy("index")
      .select(element_at(col("fields"), "d")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("1970-01-01", "2068-01-01"))
  }

  test("xml_file_metadata loads as a name->xpath map (S8)") {
    val m = MappingLoader.loadTable(
      """|klass: K
         |xml_record_xpath: record
         |xml_file_metadata:
         |  file_id: //Header/Id
         |  centre: //Header/Centre/@code
         |columns:
         |- column: a
         |  xml_cell:
         |    relative_path: ''
         |""".stripMargin)
    assert(m.fileMetadata == Map("file_id" -> "//Header/Id", "centre" -> "//Header/Centre/@code"))
    val xml = "<root><Header><Id>F123</Id><Centre code=\"X1\"/></Header></root>"
    val values = graft.sources.XmlSource.metadataValues(xml, m.fileMetadata)
    assert(values == Map("file_id" -> "F123", "centre" -> "X1"))
  }
}
