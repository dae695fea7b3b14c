package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the sharded packSequences path against the packing
  * contract: whatever the (groups, tokens, shards, budget) mix, the output
  * must be an EXACT offset packing of each group under the documented
  * deterministic layout — no rows lost, no offset out of range, running
  * offsets consistent with some total order per group, and the shards=1
  * path a special case of the same contract. */
class PackSequencesPropertySpec extends SparkSpec {

  import spark.implicits._

  // (id, group, tokens) — tuples, not an inner case class: Spark cannot
  // synthesise an encoder for a class nested in a test suite
  private val docsGen: Gen[List[(Long, Option[String], Long)]] = for {
    n <- Gen.choose(1, 60)
    docs <- Gen.listOfN(n, for {
      grp <- Gen.oneOf(Some("a"), Some("b"), Some("dominant"), None)
      toks <- Gen.choose(0L, 40L)
    } yield (grp, toks))
  } yield docs.zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t) }

  private def check(docs: List[(Long, Option[String], Long)], shards: Int,
                    budget: Long): Unit = {
    val df = docs.toDF("id", "grp", "toks")
    val out = TextStats.packSequences(df, "grp", "id", col("toks"), budget, shards)
      .select("id", "grp", "toks", "seq_id", "seq_offset")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        Option(r.getString(3)), r.getLong(4)))

    // no rows lost or invented, ids intact
    assert(out.length == docs.length, s"rows: ${out.length} vs ${docs.length}")
    assert(out.map(_._1).sorted.toSeq == docs.map(_._1).sorted)

    out.foreach { case (id, grp, toks, seqId, off) =>
      // offsets always inside the budget
      assert(off >= 0 && off < budget, s"doc $id offset $off outside [0, $budget)")
      // NULL group ⇒ NULL seq_id; real group ⇒ "grp#k"
      grp match {
        case None => assert(seqId.isEmpty, s"doc $id: null group must null seq_id")
        case Some(g) => assert(seqId.exists(_.startsWith(g + "#")),
          s"doc $id: seq_id $seqId not under group $g")
      }
    }

    // per non-null group: the starts (seq index × budget + offset) must be
    // exactly the prefix sums of the docs' token counts in SOME order —
    // i.e. a true gapless offset packing, not just in-range offsets.
    // (The null group's seq index is unrecoverable from its null seq_id;
    // its retention and offset range are covered above.)
    out.groupBy(_._2).foreach {
      case (None, _) => ()
      case (Some(g), ds) =>
        val byStart = ds.map { case (_, _, toks, seqId, off) =>
          (seqId.get.stripPrefix(g + "#").toLong * budget + off, toks)
        }.sortBy(_._1)
        var cum = 0L
        byStart.foreach { case (start, toks) =>
          assert(start == cum,
            s"group $g: start $start != cumulative $cum (docs ${byStart.toSeq})")
          cum += toks
        }
        assert(cum == ds.map(_._3).sum)
    }
  }

  test("sharded packing is an exact offset packing for arbitrary corpora") {
    val params = Gen.Parameters.default
    (1 to 25).foreach { i =>
      val docs = docsGen(params, Seed(i.toLong)).get
      val shards = 1 + (i % 5)
      val budget = 1L + (i * 7) % 60
      check(docs, shards, budget)
    }
  }
}
