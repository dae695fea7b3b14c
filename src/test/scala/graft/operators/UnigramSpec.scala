package graft.operators

import graft.SparkSpec
import graft.functions.UnigramLattice
import graft.operators.TextStats.UnigramModel
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer ([[TextStats.unigramLmTrain]]/[[TextStats.unigramLmEncode]],
  * Kudo 2018): the lattice kernels pinned against brute-force
  * enumeration over ALL segmentations, a hand-computed E-step, and the
  * train/encode contracts (determinism, prune budget, OOV, id scheme,
  * reconstruction). */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  private def hm(m: Map[String, Double]) = {
    val h = new java.util.HashMap[String, java.lang.Double]()
    m.foreach { case (k, v) => h.put(k, java.lang.Double.valueOf(v)) }
    h
  }

  /** All segmentations of `w` into pieces of 1..maxLen chars. */
  private def allSegs(w: String, maxLen: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(maxLen, w.length)).flatMap { l =>
      allSegs(w.drop(l), maxLen).map(w.take(l) +: _)
    }

  private def eStepMap(w: String, freq: Long, vocab: Map[String, Double],
                       maxLen: Int): Map[String, Double] = {
    val arr = UnigramLattice.eStep(u(w), freq, hm(vocab), maxLen)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getDouble(1))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
  }

  test("e-step matches brute-force enumeration over all segmentations") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 60) {
      val w = Seq.fill(2 + rnd.nextInt(5))("ab" (rnd.nextInt(2))).mkString
      val cands = (for (i <- 0 until w.length; l <- 1 to 3; if i + l <= w.length)
        yield w.substring(i, i + l)).distinct
      // every char kept; each multi kept with prob 1/2 — some lattices sparse
      val vocab = cands.filter(c => c.length == 1 || rnd.nextBoolean())
        .map(c => c -> (0.05 + rnd.nextDouble()))
        .toMap
      val freq = 1L + rnd.nextInt(9)
      val paths = allSegs(w, 3).filter(_.forall(vocab.contains))
      val z = paths.map(_.map(vocab).product).sum
      val expected = paths
        .flatMap(p => p.map(piece => piece -> vocab(piece) * 0.0)) // piece keys
        .map(_._1).distinct.map { piece =>
          piece -> freq * paths.map(p =>
            p.count(_ == piece) * p.map(vocab).product).sum / z
        }.filter(_._2 > 0).toMap
      val got = eStepMap(w, freq, vocab, 3)
      assert(got.keySet == expected.keySet, s"word $w piece sets diverge")
      expected.foreach { case (piece, e) =>
        assert(math.abs(got(piece) - e) < 1e-9 * (1 + e.abs),
          s"word $w piece $piece: got ${got(piece)}, brute force $e")
      }
    }
  }

  test("e-step hand case: abc over a 6-piece vocabulary") {
    val vocab = Map("a" -> 0.3, "b" -> 0.2, "c" -> 0.1,
      "ab" -> 0.2, "bc" -> 0.15, "abc" -> 0.05)
    // paths: a|b|c=.006, ab|c=.02, a|bc=.045, abc=.05 → Z=.121
    val got = eStepMap("abc", 7L, vocab, 3)
    val z = 0.121
    assert(math.abs(got("abc") - 7 * 0.05 / z) < 1e-12)
    assert(math.abs(got("ab") - 7 * 0.02 / z) < 1e-12)
    assert(math.abs(got("a") - 7 * (0.006 + 0.045) / z) < 1e-12)
    assert(math.abs(got("c") - 7 * (0.006 + 0.02) / z) < 1e-12)
  }

  private def viterbiPieces(w: String, logp: Map[String, Double], maxLen: Int,
                            oov: Double): Seq[String] = {
    val arr = UnigramLattice.viterbi(u(w), hm(logp), maxLen, oov)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  /** The decoder's own cumulative 6-dp-rounded score of a piece path —
    * the SAME half-away-from-zero rounding the kernel uses (shared
    * helper), so the test can't silently bless a rounding divergence. */
  private def pathScore(p: Seq[String], logp: Map[String, Double], oov: Double) =
    p.foldLeft(0.0)((acc, piece) =>
      UnigramLattice.round6(acc + logp.getOrElse(piece, oov)))

  test("viterbi attains the brute-force maximum cumulative-rounded score") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 60) {
      val w = Seq.fill(2 + rnd.nextInt(5))("ab" (rnd.nextInt(2))).mkString
      val cands = (for (i <- 0 until w.length; l <- 1 to 3; if i + l <= w.length)
        yield w.substring(i, i + l)).distinct
      val logp = cands.filter(c => c.length == 1 || rnd.nextBoolean())
        .map(c => c -> -(0.1 + 3 * rnd.nextDouble())).toMap
      val got = viterbiPieces(w, logp, 3, -100.0)
      assert(got.mkString == w, s"pieces must reconstruct $w, got $got")
      assert(got.forall(logp.contains), "no OOV here: every char is in vocab")
      val best = allSegs(w, 3).filter(_.forall(logp.contains))
        .map(pathScore(_, logp, -100.0)).max
      assert(pathScore(got, logp, -100.0) == best,
        s"word $w: viterbi ${pathScore(got, logp, -100.0)} vs brute-force $best")
    }
  }

  test("viterbi ties break toward the longest piece") {
    // lp(ab) == lp(a)+lp(b) exactly — tie at node 2; the longest piece wins
    val logp = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(viterbiPieces("ab", logp, 2, -100.0) == Seq("ab"))
  }

  test("viterbi admits single OOV characters at the penalty score") {
    val logp = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -1.5)
    assert(viterbiPieces("aqb", logp, 2, -100.0) == Seq("a", "q", "b"))
  }

  private lazy val corpus = Seq(
    (1L, "the cat sat"), (2L, "the cat ran"), (3L, "a fat cat sat"),
    (4L, "the rat sat"), (5L, "fat rats eat"), (6L, "cats eat the rat")
  ).toDF("doc_id", "text")

  test("train: budget respected, singles kept, probabilities normalised, deterministic") {
    val m = TextStats.unigramLmTrain(corpus, "text",
      vocabMulti = 6, seedMulti = 20, maxPieceLen = 3)
    val chars = corpus.collect().flatMap(_.getString(1).split(" "))
      .flatMap(_.toCharArray).map(_.toString).distinct.toSet
    val (one, many) = m.pieces.partition(_._1.length == 1)
    assert(one.map(_._1).toSet == chars, "every corpus character survives")
    assert(many.size == 6, s"multi-piece budget, got ${many.size}")
    assert(math.abs(m.pieces.map(_._2).sum - 1.0) < 1e-9)
    assert(m.pieces.forall(_._2 > 0))
    val m2 = TextStats.unigramLmTrain(corpus, "text",
      vocabMulti = 6, seedMulti = 20, maxPieceLen = 3)
    assert(m.pieces == m2.pieces, "training is deterministic")
  }

  test("vocab ids and prune tie-break follow UTF-8 code-point order, not UTF-16") {
    // U+FB00 (ﬀ) < U+1D552 (𝕒) in code-point/UTF-8 order, but 𝕒's lead
    // surrogate 0xD835 < 0xFB00 makes Java String order disagree — the
    // same divergence class BpeSpec pins for the BPE argmax tie-break.
    val m = UnigramModel(Seq(("𝕒", 0.5), ("ﬀ", 0.5)), maxPieceLen = 2)
    assert(m.vocab == Seq(("ﬀ", 0L), ("𝕒", 1L)),
      s"vocab must rank ﬀ before 𝕒 (UTF-8 order), got ${m.vocab}")
    // end-to-end: "ﬀz" and "𝕒z" are exactly symmetric, so their pruned
    // posteriors tie at 10 dp; the vocabMulti=1 survivor must be the
    // UTF-8-lesser piece ﬀz (a UTF-16 tie-break would keep 𝕒z)
    val docs = Seq((1L, "ﬀz 𝕒z")).toDF("doc_id", "text")
    val trained = TextStats.unigramLmTrain(docs, "text",
      vocabMulti = 1, seedMulti = 2, maxPieceLen = 2)
    val multis = trained.pieces.map(_._1)
      .filter(s => s.codePointCount(0, s.length) > 1)
    assert(multis == Seq("ﬀz"),
      s"prune tie must keep the UTF-8-lesser piece, got $multis")
  }

  test("train then encode: reconstruction, ids, OOV contract") {
    val m = TextStats.unigramLmTrain(corpus, "text",
      vocabMulti = 6, seedMulti = 20, maxPieceLen = 3)
    val withOov = corpus.unionAll(Seq((-9L, "zq at")).toDF("doc_id", "text"))
    val enc = TextStats.unigramLmEncode(withOov, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3), r.getLong(4)))
    // concatenating pieces in (word_idx, sym_idx) order reconstructs the text
    val rebuilt = enc.groupBy(_._1).view.mapValues(
      _.sortBy(t => (t._2, t._3)).groupBy(_._2).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_._3).map(_._4).mkString).mkString(" ")).toMap
    withOov.collect().foreach { r =>
      assert(rebuilt(r.getLong(0)) == r.getString(1),
        s"doc ${r.getLong(0)} failed to reconstruct")
    }
    val ids = m.vocab.toMap
    enc.foreach { case (_, _, _, piece, id) =>
      assert(id == ids.getOrElse(piece, -1L), s"piece $piece id $id")
    }
    val oovRows = enc.filter(_._1 == -9L).sortBy(t => (t._2, t._3))
    assert(oovRows.exists(t => t._4 == "z" && t._5 == -1L), "z is OOV → -1")
    assert(oovRows.exists(t => t._4 == "q" && t._5 == -1L), "q is OOV → -1")
  }
}
