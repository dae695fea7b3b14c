package graft.clean

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Cross-pins each cleaner's Column (codegen) implementation against its
  * pure-Scala mirror over random-ish inputs — drift in either fails. */
class CleanersPropertySpec extends SparkSpec {

  private val interesting = Seq(
    "", " ", "cb3 0ds", "CB30DS", "sw1a1aa", "not a postcode", "123-456-7890",
    "M", "male", "f", "2", "unknown", "C34.3,R93.2,Z51.5", "U212,Y973,X1",
    "98", "iiC", "IIII-B", "Quick", "T4a", "x", "Nx", "Bob, Smith.", "a`b.c;d",
    "  padded  ", "A12345Z", "9999999999a", "1", "99", "InValiD")

  private val gen: Gen[String] = Gen.oneOf(
    Gen.oneOf(interesting),
    Gen.alphaNumStr.map(_.take(10)),
    Gen.listOfN(6, Gen.oneOf(('A' to 'Z') ++ ('0' to '9') ++ Seq(' ', ',', ';', '.', '-')))
      .map(_.mkString))

  test("Column and Scala cleaner implementations agree") {
    import spark.implicits._
    val samples = (0 until 6).flatMap(i =>
      Gen.listOfN(40, gen).apply(Gen.Parameters.default, Seed(7L + i)).toSeq).flatten
    val inputs = (interesting ++ samples).distinct.filter(_.nonEmpty)
    val df = inputs.toDF("v").cache()

    for (name <- Cleaners.names.toSeq.sorted) {
      val colResults = df.select(Cleaners.forName(name)(col("v"))).collect()
        .map(r => Option(r.getString(0)).getOrElse("<null>"))
      val scalaResults = inputs.map(Cleaners.scalaForName(name))
        .map(v => Option(v).getOrElse("<null>"))
      colResults.zip(scalaResults).zip(inputs).foreach { case ((c, sc), in) =>
        assert(c == sc, s"cleaner :$name diverged on input '$in': column='$c' scala='$sc'")
      }
    }
  }
}
