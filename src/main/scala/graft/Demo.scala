package graft

import org.apache.spark.sql.SparkSession

/** Scratch verify driver — NOT committed. Drives the oversized-CFB Excel
  * fallback through the public Excel.tables surface. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("demo")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tmp(bytes: Array[Byte], suffix: String): String = {
      val f = java.io.File.createTempFile("demo-excel", suffix)
      f.deleteOnExit()
      java.nio.file.Files.write(f.toPath, bytes)
      f.getAbsolutePath
    }
    def ref(name: String): Array[Byte] =
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/root/reference/test/resources", name))

    // 1. genuine BIFF8 .xls forced through the oversized route == in-memory route
    val xls = tmp(ref("sample_xls.xls"), ".xls")
    val inMem = sources.Excel.tables(spark, Seq(xls)).collect().toSet
    val fb = sources.Excel.tables(spark, Seq(xls), inMemoryMaxBytes = 1L).collect().toSet
    println(s"DEMO1 biff8 fallback==inmem: ${fb == inMem} rows=${fb.size}")

    // 2. encrypted OOXML + password through the oversized route
    val enc = tmp(ref("password_protected_sample_xlsx.xlsx"), ".xlsx")
    val encRows = sources.Excel.tables(spark, Seq(enc),
      password = Some("carrot"), inMemoryMaxBytes = 1L).collect()
    println(s"DEMO2 encrypted+password rows=${encRows.length} " +
      s"first=${encRows.map(r => r.getSeq[String](3).mkString("|")).sorted.mkString(";")}")

    // 3. missing password raises the documented error
    val e3 = try {
      sources.Excel.tables(spark, Seq(enc), inMemoryMaxBytes = 1L).collect(); "NO-ERROR"
    } catch { case e: Exception =>
      Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage) }
    println(s"DEMO3 missing-password msg contains 'password protected': ${e3.contains("password protected")}")

    // 4. mixed small+oversized in ONE call: identical qualified file spellings
    val both = sources.Excel.tables(spark, Seq(xls, enc), password = Some("carrot"),
      inMemoryMaxBytes = ref("sample_xls.xls").length + 1L)
    val files = both.select("file").distinct().collect().map(_.getString(0)).sorted
    println(s"DEMO4 mixed routing files=${files.mkString(", ")}")

    spark.stop()
  }
}
