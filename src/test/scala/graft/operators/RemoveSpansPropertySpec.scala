package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for removeSharedSpans against a naive driver-side
  * re-derivation of the contract: for ANY corpus, the distributed
  * gaps-and-islands + in-row-filter pipeline must excise exactly the
  * tokens covered by some shared ≥n-token window — the brute-force
  * definition, computed here with sliding() and Sets, no Spark. A tiny
  * vocabulary forces heavy genuine sharing (overlapping runs, full-doc
  * wipes, multi-island docs), the shapes the fixtures can't enumerate. */
class RemoveSpansPropertySpec extends SparkSpec {

  import spark.implicits._

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 30)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 15)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def naive(docs: List[(Long, String)], n: Int,
                    minDocs: Int): Map[Long, (String, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq
    }.toMap
    // gram string -> distinct docs containing it
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    toks.foreach { case (id, ws) =>
      ws.sliding(n).filter(_.length == n).foreach { w =>
        val g = w.mkString(" ")
        gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id
      }
    }
    toks.map { case (id, ws) =>
      val covered = Array.fill(ws.length)(false)
      ws.sliding(n).zipWithIndex.filter(_._1.length == n).foreach {
        case (w, s) =>
          if (gramDocs(w.mkString(" ")).size >= minDocs)
            (s until s + n).foreach(covered(_) = true)
      }
      val kept = ws.zipWithIndex.collect { case (w, i) if !covered(i) => w }
      id -> (kept.mkString(" "), covered.count(identity).toLong)
    }
  }

  test("excision matches the brute-force shared-window definition on random corpora") {
    val params = Gen.Parameters.default
    (1 to 20).foreach { i =>
      val docs = corpusGen(params, Seed(i.toLong)).get
      val n = 2 + (i % 3) // window sizes 2..4
      val expected = naive(docs, n, minDocs = 2)
      val got = TextDedup.removeSharedSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = n)
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(got == expected,
        s"seed $i n=$n:\n got      $got\n expected $expected\n corpus $docs")
    }
  }
}
