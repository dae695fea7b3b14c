package graft.sources

import graft.SparkSpec

import java.nio.file.Files

/** The streaming reader for oversized text files: byte-identical results
  * to the in-memory path across encodings, line-ending styles and quoted
  * CSV records, at exact per-file line numbers. */
class LineSourceSpec extends SparkSpec {

  private def writeTmp(name: String, bytes: Array[Byte]): String = {
    val dir = Files.createTempDirectory("lines")
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p.toString
  }

  private def collectLines(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.orderBy("lineno").collect().map(r => (r.getLong(1), r.getString(2))).toSeq

  test("streamed lines match the in-memory path (utf-8, utf-16, windows-1252)") {
    val cases = Seq(
      "plain utf-8" -> "alpha\nbeta\ngamma\n".getBytes("UTF-8"),
      "crlf + no trailing newline" -> "one\r\ntwo\r\nthree".getBytes("UTF-8"),
      "bare cr" -> "a\rb\r\rc\r".getBytes("UTF-8"),
      "utf-8 bom" -> (Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        "héllo\nwörld\n".getBytes("UTF-8")),
      "utf-16le bom" -> (Array[Byte](0xFF.toByte, 0xFE.toByte) ++
        "seize\nbits\n".getBytes("UTF-16LE")),
      "utf-16be bom" -> (Array[Byte](0xFE.toByte, 0xFF.toByte) ++
        "big\nendian\n".getBytes("UTF-16BE")),
      "windows-1252 fallback" -> "café\nnaïve ÿ\n".getBytes("windows-1252"))
    cases.foreach { case (label, bytes) =>
      val p = writeTmp("case.txt", bytes)
      val inMem = collectLines(LineSource.lines(spark, Seq(p)))
      val streamed = collectLines(LineSource.lines(spark, Seq(p), inMemoryMaxBytes = 1L))
      assert(streamed == inMem, s"$label: streamed $streamed vs in-memory $inMem")
    }
  }

  test("streamed csv records keep embedded newlines inside quotes") {
    val content = "name,notes\nBob,\"line one\nline two\"\nAnn,plain\n"
    val p = writeTmp("embedded.csv", content.getBytes("UTF-8"))
    val inMem = collectLines(LineSource.csvLines(spark, Seq(p)))
    val streamed = collectLines(LineSource.csvLines(spark, Seq(p), inMemoryMaxBytes = 1L))
    assert(streamed == inMem)
    assert(streamed.map(_._2) == Seq("name,notes", "Bob,\"line one\nline two\"", "Ann,plain"))
  }

  test("dispatch mixes small (in-memory) and big (streamed) files in one read") {
    val small = writeTmp("small.txt", "s1\ns2\n".getBytes("UTF-8"))
    val big = writeTmp("big.txt", ("b1\n" * 100).getBytes("UTF-8"))
    val df = LineSource.lines(spark, Seq(small, big), inMemoryMaxBytes = 50L)
    val byFile = df.collect().groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq).toMap
    val smallLines = byFile.collect { case (f, v) if f.contains("small") => v }.head
    val bigLines = byFile.collect { case (f, v) if f.contains("big") => v }.head
    assert(smallLines == Seq("s1", "s2"))
    assert(bigLines == Seq.fill(100)("b1"))
  }

  test("a full delimited read works through the streaming path") {
    // end-to-end: the oversized-file path feeds the same mapping pipeline
    val az = ('A' to 'Z').map(_.toString)
    val content = az.mkString(",") + "\n" + Seq.fill(26)("1").mkString(",") + "\n"
    val p = writeTmp("wide.csv", content.getBytes("UTF-8"))
    val mapping = graft.model.TableMapping(delimiter = Some(","),
      columns = Seq.fill(26)(graft.model.ColumnMapping()))
    val lines = LineSource.csvLines(spark, Seq(p), inMemoryMaxBytes = 1L)
    val rows = Tabular.delimitedCells(lines, ",", 26, liberal = false)
      .orderBy("lineno").select("cells").collect().map(_.getSeq[String](0))
    assert(rows(0) == az)
    assert(rows(1) == Seq.fill(26)("1"))
  }
}
