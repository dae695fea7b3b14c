package graft.streaming

import graft.SparkSpec
import graft.model.MappingLoader
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpec {

  import Streams._

  test("records() applies a mapping to a memory stream incrementally") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mapping = MappingLoader.loadTable(
      """|klass: Person
         |columns:
         |- column: surname
         |  mappings:
         |  - field: surname
         |    clean: :name
         |""".stripMargin)
    val in = MemoryStream[(String, Long, Seq[String])]
    val lines = in.toDF.toDF("file", "lineno", "cells")
    val q = records(lines, mapping)
      .select(element_at(col("fields"), "surname").as("surname"))
      .writeStream.format("memory").queryName("recs").outputMode("append").start()
    in.addData(("f", 0L, Seq("smith ")), ("f", 1L, Seq(" doe")))
    q.processAllAvailable()
    val out = spark.sql("select surname from recs").collect().map(_.getString(0)).sorted
    assert(out.toSeq == Seq("DOE", "SMITH"))
    q.stop()
  }

  test("tumbling window with watermark aggregates per key") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF.toDF("ts", "k", "value")
    val q = tumblingCounts(df, "ts", "k", "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win").outputMode("update").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData(
      (t("2024-01-01 10:05:00"), "a", 1.5),
      (t("2024-01-01 10:55:00"), "a", 2.0),
      (t("2024-01-01 11:05:00"), "a", 3.0),
      (t("2024-01-01 10:10:00"), "b", 4.0))
    q.processAllAvailable()
    val rows = spark.sql("select k, n, total from win order by k, n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows.contains(("a", 2L, 3.5)))   // 10:00 window
    assert(rows.contains(("a", 1L, 3.0)))   // 11:00 window
    assert(rows.contains(("b", 1L, 4.0)))
    q.stop()
  }

  test("delimitedStream matches the batch delimited path on the same files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftstream")
    java.nio.file.Files.write(dir.resolve("a.csv"),
      "surname,forename\nSMITH,JOHN\nDOE,JANE\n".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.csv"),
      "surname,forename\nBLOGGS,FRED\n".getBytes("UTF-8"))
    val mapping = graft.model.MappingLoader.loadTable(
      """|header_lines: 1
         |klass: Person
         |columns:
         |- column: surname
         |  mappings:
         |  - field: surname
         |- column: forename
         |  mappings:
         |  - field: forename
         |""".stripMargin)
    val q = delimitedStream(spark, dir.toString, mapping)
      .writeStream.format("memory").queryName("par").outputMode("append").start()
    q.processAllAvailable()
    val streamed = spark.sql("select fields['surname'] s, fields['forename'] f from par")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    // batch twin over the same two files
    val batch = graft.run.Importer.mappedTables(spark,
        dir.resolve("a.csv").toString,
        Seq(mapping.copy(filenamePattern = Some("\\.csv\\z"), canonicalName = Some("p"))))("p")
      .unionByName(graft.run.Importer.mappedTables(spark,
        dir.resolve("b.csv").toString,
        Seq(mapping.copy(filenamePattern = Some("\\.csv\\z"), canonicalName = Some("p"))))("p"))
      .select(element_at(col("fields"), "surname"), element_at(col("fields"), "forename"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.length == 3)
    q.stop()
  }

  test("delimitedStream assigns distinct indexes to byte-identical rows") {
    val dir = java.nio.file.Files.createTempDirectory("graftstreamdup")
    // three byte-identical data rows in one file
    java.nio.file.Files.write(dir.resolve("dups.csv"),
      "surname\nSMITH\nSMITH\nSMITH\n".getBytes("UTF-8"))
    val mapping = graft.model.MappingLoader.loadTable(
      """|header_lines: 1
         |klass: Person
         |row_identifier: index
         |columns:
         |- column: surname
         |  mappings:
         |  - field: surname
         |""".stripMargin)
    val q = delimitedStream(spark, dir.toString, mapping)
      .writeStream.format("memory").queryName("dups").outputMode("append").start()
    q.processAllAvailable()
    val ids = spark.sql("select fields['row_identifier'] from dups")
      .collect().map(_.getString(0))
    assert(ids.length == 3, "all three identical rows must survive")
    assert(ids.distinct.length == 3,
      s"identical rows must get distinct indexes, got ${ids.toSeq}")
    q.stop()
  }

  test("streaming exact dedup drops watermark-window duplicates across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val df = in.toDF.toDF("ts", "text")
    val q = dedupStream(df, "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData((t("2024-01-01 10:00:00"), "alpha"), (t("2024-01-01 10:01:00"), "alpha"))
    q.processAllAvailable()
    in.addData((t("2024-01-01 10:02:00"), "alpha"), (t("2024-01-01 10:03:00"), "beta"))
    q.processAllAvailable()
    val rows = spark.sql("select text from dedup").collect().map(_.getString(0)).sorted
    assert(rows.toSeq == Seq("alpha", "beta"))
    q.stop()
  }

  test("stateful sessionization closes sessions across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = sessionize(in.toDS(), gapMs = 1000)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // batch 1: two events within gap
    in.addData(Event(1, 1000, 1.0), Event(1, 1500, 2.0))
    q.processAllAvailable()
    // batch 2: a far-future event closes the first session
    in.addData(Event(1, 100000, 5.0))
    q.processAllAvailable()
    val sessions = spark.sql("select * from sess").as[Session].collect()
    assert(sessions.length == 1)
    assert(sessions.head == Session(1, 1000, 1500, 2, 3.0))
    q.stop()
  }
}
