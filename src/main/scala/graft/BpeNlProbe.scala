package graft.operators

object BpeNlProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.runtime.GraftSession.builder(master = "local[2]", shufflePartitions = 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nl = "\n"
    val L = ""
    val R = ""
    val esc = (s: String) => s.map(ch => if (ch < ' ') f"<${ch.toInt}>" else ch.toString).mkString
    // corpus with a newline INSIDE a word ("ab\ncd" is one word under split-on-space)
    val docs = Seq(
      (1L, s"ab${nl}cd ab${nl}cd ab${nl}cd xy xy"),
      (2L, s"ab${nl}cd xy zq")).toDF("id", "text")
    // probe bpeParseRepr directly on a framed repr with an unframed newline gap
    val repr = L + "a" + R + nl + L + "b" + R
    println("parseRepr: " + TextStats.bpeParseRepr(repr).map(esc).mkString("[", ", ", "]"))
    val spec = TextStats.bpeTrain(docs, "text", 4, specBatch = 3)
    val seq = TextStats.bpeTrainSequential(docs, "text", 4)
    def show(m: TextStats.BpeModel) =
      m.merges.map { case (l, r, c) => s"(${esc(l)},${esc(r)},$c)" }.mkString(" ")
    println("spec merges: " + show(spec))
    println("seq  merges: " + show(seq))
    println("equal: " + (spec == seq))
    spark.stop()
  }
}
