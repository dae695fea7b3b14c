package graft.run

import graft.SparkSpec
import graft.model.MappingLoader
import org.apache.spark.sql.functions._

class XmlMetadataImportSpec extends SparkSpec {
  test("xml_file_metadata attaches meta_* literal columns via the Importer") {
    val dir = java.nio.file.Files.createTempDirectory("xmlmeta")
    val p = dir.resolve("batch.xml")
    java.nio.file.Files.write(p,
      """<root><Header><BatchId>B42</BatchId></Header>
        |<record><surname>SMITH</surname></record>
        |<record><surname>DOE</surname></record></root>""".stripMargin.getBytes("UTF-8"))
    val mappings = MappingLoader.loadTables(
      """|- filename_pattern: !ruby/regexp /\.xml\z/i
         |  format: xml_table
         |  xml_record_xpath: record
         |  xml_file_metadata:
         |    batch_id: //Header/BatchId
         |  columns:
         |  - column: surname
         |    klass: Person
         |    xml_cell:
         |      relative_path: ''
         |    mappings:
         |    - field: surname
         |""".stripMargin)
    val df = Importer.mappedTables(spark, p.toString, mappings)("")
    val rows = df.orderBy("index")
      .select(element_at(col("fields"), "surname"), col("meta_batch_id"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("SMITH", "B42"), ("DOE", "B42")))
  }
}
