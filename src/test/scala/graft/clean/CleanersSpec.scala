package graft.clean

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins every cleaner against the reference's documented tables
  * (`/root/reference/docs/inbuilt-cleaning-methods.md`) and mapper tests
  * (`/root/reference/test/mapper_test.rb:383-412`), for BOTH the Column
  * implementation and the pure-Scala mirror.
  */
class CleanersSpec extends SparkSpec {

  private def runColumn(cleaner: String, values: Seq[String]): Seq[String] = {
    import spark.implicits._
    val df = values.toDF("v")
    df.select(Cleaners.forName(cleaner)(col("v")).as("out"))
      .collect().map(r => r.getString(0)).toSeq
  }

  private def check(cleaner: String, cases: (String, String)*): Unit = {
    val (ins, outs) = (cases.map(_._1), cases.map(_._2))
    // Column implementation
    assert(runColumn(cleaner, ins) == outs, s"column impl of :$cleaner")
    // Scala mirror
    val scalaOuts = ins.map(Cleaners.scalaForName(cleaner))
    assert(scalaOuts == outs, s"scala impl of :$cleaner")
  }

  test(":nhsnumber strips non-digits") {
    check("nhsnumber",
      "  123-456-7890" -> "1234567890",
      "888 888 8888  " -> "8888888888",
      "678-098    9876" -> "6780989876",
      "Quick O`brown, Fox-38" -> "38")
  }

  test(":lpi upcases and strips non-alphanumerics") {
    check("lpi",
      "rgt9878" -> "RGT9878",
      "   1878785234" -> "1878785234",
      "RGT-786" -> "RGT786",
      "65 78997" -> "6578997",
      "Quick O`brown, Fox-38" -> "QUICKOBROWNFOX38")
  }

  test(":hospitalnumber drops trailing non-digit") {
    check("hospitalnumber",
      "RGT1223B" -> "RGT1223",
      "746R876" -> "746R876",
      "d4578886C" -> "d4578886",
      "Quick O`brown, Fox-38" -> "Quick O`brown, Fox-38")
  }

  test(":sex normalises to 1/2/0") {
    check("sex",
      "male" -> "1", "FEMALE" -> "2", "1" -> "1", "2" -> "2",
      "M" -> "1", "F" -> "2", "UNKNOWN" -> "0", "unk" -> "0",
      "Quick O`brown, Fox-38" -> "0")
  }

  test(":name cleans punctuation and case") {
    check("name",
      "ollie" -> "OLLIE",
      "O`brian" -> "O'BRIAN",
      "Smith        Jones" -> "SMITH JONES",
      "  67890" -> "67890",
      ",,, Potato" -> "POTATO",
      "Thomas h.   " -> "THOMAS H",
      "Quick O`brown, Fox-38" -> "QUICK O'BROWN FOX-38",
      "anna.belle,smith" -> "ANNABELLE SMITH")
  }

  test(":ethniccategory maps legacy codes") {
    check("ethniccategory",
      "1" -> "M", "99" -> "X", "A" -> "A", "InValiD" -> "INVALID")
  }

  test(":icd strips non-alphanumerics per code (mapper_test.rb:395-398)") {
    check("icd", "C34.3,R93.2,Z51.5" -> "C343 R932 Z515")
  }

  test(":code_icd keeps dots, drops all-symbol codes") {
    check("code_icd",
      "c50.9" -> "C50.9",
      "C61.x, C34.2, --." -> "C61.X C34.2",
      "C14x" -> "C14X",
      "c459;  ~~; C01.9" -> "C459 C01.9")
  }

  test(":code_opcs keeps only cleaned 3-4 char codes") {
    check("code_opcs",
      "U212,Y973,X1" -> "U212 Y973",
      "98" -> "",
      "TooLong" -> "",
      "AbcD" -> "ABCD",
      "1234" -> "1234",
      "X71.9, ~~, e543" -> "X719 E543",
      "  t-12.4" -> "T124")
  }

  test(":code splits and strips grouped codes") {
    check("code", "u3,y2,x1" -> "u3 y2 x1")
  }

  test(":postcode pads UK postcodes to the 7-char db convention") {
    check("postcode",
      "N2 5zz" -> "N2  5ZZ",
      "ZZ32 7rr" -> "ZZ327RR",
      "W12 8QT " -> "W12 8QT",
      "ab213TT" -> "AB213TT",
      "UNKNOWN" -> "UNKNOWN",
      "Quick O`brown, Fox-38" -> "Quick O`brown, Fox-38")
  }

  test(":tnmcategory strips leading T/N/M and normalises x") {
    check("tnmcategory",
      "T1A" -> "1a", "Nx" -> "X", "n1" -> "1", "x" -> "X",
      "TIS" -> "is", "m0" -> "0", "Unknown" -> "unknown")
  }

  test(":roman5 deromanises 1-5 anywhere") {
    check("roman5",
      "I" -> "1", "5" -> "5", "IV" -> "4", "iii" -> "3",
      "iiC" -> "2C", "IIII-B" -> "4-B", "UNKNOWN" -> "UNKNOWN",
      "Quick O`brown, Fox-38" -> "Qu1ck O`brown, Fox-38")
  }

  test(":upcase and :strip") {
    check("upcase", "c50.9" -> "C50.9", "iii" -> "III")
    check("strip", "  a b  " -> "a b")
  }

  test("multiple cleans compose left-to-right (code then upcase)") {
    import spark.implicits._
    val df = Seq("u3,y2,x1").toDF("v")
    val out = df.select(
      Cleaners.forName("upcase")(Cleaners.forName("code")(col("v")))).collect()
    assert(out.head.getString(0) == "U3 Y2 X1")
  }
}
