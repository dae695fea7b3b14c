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
