package graft.operators

import graft.SparkSpec
import graft.operators.TextStats.BpeModel

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpeTrain: hand-computed merges, weighted counts, early exhaustion") {
    // wordFreq: aa:2, ab:1 → pairs (a,a):2 (a,b):1 → merge1 (a,a)
    // then aa→[aa], ab→[a,b] → merge2 (a,b); then no pairs left
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("id", "text")
    val m = TextStats.bpeTrain(docs, "text", numMerges = 5)
    assert(m.alphabet == Seq("a", "b"))
    assert(m.merges == Seq(("a", "a", 2L), ("a", "b", 1L)))
    // vocab: alphabet ids 0..A-1 in order, merges A.. in rank order
    assert(m.vocab.toMap == Map("a" -> 0L, "b" -> 1L, "aa" -> 2L, "ab" -> 3L))
  }

  test("bpeTrain: tie on count breaks by (left, right) ascending") {
    // "cb" and "ba" both count 1; (b,a) < (c,b) lexicographically
    val docs = Seq((1L, "cb ba")).toDF("id", "text")
    val m = TextStats.bpeTrain(docs, "text", numMerges = 1)
    assert(m.merges.head._1 == "b" && m.merges.head._2 == "a")
  }

  test("bpeTrain: determinism across invocations and partitionings") {
    val docs = Seq.tabulate(60)(i => (i.toLong, s"row value v${i % 7} agg"))
      .toDF("id", "text")
    val a = TextStats.bpeTrain(docs, "text", 8)
    val b = TextStats.bpeTrain(docs.repartition(7), "text", 8)
    assert(a == b, "merge list must not depend on partitioning")
  }

  test("bpeEncode: greedy left-to-right, rank order, OOV -1") {
    val model = BpeModel(Seq("a", "b"), Seq(("a", "a", 2L), ("a", "b", 1L)))
    val docs = Seq((7L, "aa ab ba aax aaa")).toDF("id", "text")
    val got = TextStats.bpeEncode(docs, "id", "text", model)
      .orderBy("word_idx", "sym_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (0, 0, 2L),            // "aa"  -> [aa]
      (1, 0, 3L),            // "ab"  -> [ab]
      (2, 0, 1L), (2, 1, 0L),// "ba"  -> [b, a] (no (b,a) merge trained)
      (3, 0, 2L), (3, 1, -1L), // "aax" -> [aa, x] with x OOV
      (4, 0, 2L), (4, 1, 0L))) // "aaa" -> greedy [aa, a], NOT [a, aa]
  }

  test("bpeEncode parity: encoding the training corpus replays training reprs") {
    // every encoded symbol of the training corpus must be in-vocab (no -1):
    // encode replays the merge loop, so training symbols are reachable
    val docs = Seq.tabulate(40)(i => (i.toLong, s"table scan t${i % 5} fast"))
      .toDF("id", "text")
    val m = TextStats.bpeTrain(docs, "text", 10)
    val enc = TextStats.bpeEncode(docs, "id", "text", m)
    assert(enc.filter($"token_id" === -1L).count() == 0,
      "training-corpus encode must never go OOV")
    // id range: [0, |alphabet| + |merges|)
    val ids = enc.select("token_id").as[Long].collect()
    assert(ids.forall(id => id >= 0 && id < m.alphabet.size + m.merges.size))
  }

  test("native BpeSegment matches the replace-chain rendering on randomized words") {
    // the native merge loop must reproduce the framing/replace semantics
    // bit-for-bit: same (word_idx, sym_idx, token_id) triples on words
    // drawn from a 3-letter alphabet (maximally merge-dense, so every
    // overlap/adjacency edge case occurs), plus multi-code-point chars
    val rnd = new scala.util.Random(42)
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(6))(
        Seq.fill(1 + rnd.nextInt(8))("abc".charAt(rnd.nextInt(3))).mkString)
        .mkString(" "))) :+
      (999L, "naïve café 😀ab a😀b")
    val df = docs.toDF("id", "text")
    val m = TextStats.bpeTrain(df, "text", 12)
    def rows(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("id", "word_idx", "sym_idx").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    assert(rows(TextStats.bpeEncode(df, "id", "text", m)) ==
      rows(TextStats.bpeEncodeReplaceChain(df, "id", "text", m)))
  }

  test("speculative rounds match the sequential engine on randomized corpora") {
    // the exactness claim: the simulate-and-verify batch engine commits the
    // bit-identical merge trajectory (pairs AND counts) the merge-per-job
    // engine derives — on merge-dense random corpora over tiny alphabets
    // (ties, overlapping runs and created-pair boosts all occur)
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val alpha = "ab" + ("cde".take(trial % 3))
      val docs = Seq.tabulate(120)(i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(5))(
          Seq.fill(1 + rnd.nextInt(9))(alpha.charAt(rnd.nextInt(alpha.length)))
            .mkString).mkString(" "))).toDF("id", "text")
      val k = 6 + rnd.nextInt(14)
      // sampleWords below the distinct-word count forces the DISTRIBUTED
      // speculative engine (a covering sample takes the driver-exact path,
      // pinned separately below)
      val spec = TextStats.bpeTrain(docs, "text", k, specBatch = 5, sampleWords = 10)
      val seq = TextStats.bpeTrainSequential(docs, "text", k)
      assert(spec == seq, s"trial $trial (k=$k): speculative != sequential")
    }
  }

  test("driver-exact path (sample covers the word table) matches the sequential engine") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      val docs = Seq.tabulate(80)(i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(4))(
          Seq.fill(1 + rnd.nextInt(8))("abc".charAt(rnd.nextInt(3)))
            .mkString).mkString(" "))).toDF("id", "text")
      val k = 5 + rnd.nextInt(12)
      val exact = TextStats.bpeTrain(docs, "text", k) // default sample covers all
      val seq = TextStats.bpeTrainSequential(docs, "text", k)
      assert(exact == seq, s"trial $trial (k=$k): exact path != sequential")
    }
  }

  test("driver-exact tie-break is UTF-8 code-point order, not UTF-16") {
    // U+FB00 (ﬀ) < U+1D552 (𝕒) in code-point/UTF-8 order, but 𝕒's lead
    // surrogate 0xD835 < 0xFB00 makes Java String order disagree — a
    // UTF-16 comparator would pick the wrong side of this tie
    val docs = Seq((1L, "ﬀz 𝕒z")).toDF("id", "text")
    val exact = TextStats.bpeTrain(docs, "text", 1)
    val seq = TextStats.bpeTrainSequential(docs, "text", 1)
    assert(exact == seq)
    assert(exact.merges.head._1 == "ﬀ", s"got ${exact.merges.head}")
  }

  test("speculative engine survives adversarial tie/boost corpora") {
    // crafted so a naive non-interacting batch WOULD misorder: merging
    // (a,b) creates (ab,y) occurrences that tie and tie-break-beat the
    // next tentative pair — verification must truncate and correct
    val docs = (Seq.fill(4)("x a b") ++ Seq.fill(4)("a b y") ++
      Seq.fill(3)("ac d") ++ Seq.fill(2)("a a a a")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (k <- Seq(3, 5, 8)) {
      val spec = TextStats.bpeTrain(docs, "text", k, specBatch = 6, sampleWords = 4)
      val seq = TextStats.bpeTrainSequential(docs, "text", k)
      assert(spec == seq, s"k=$k: speculative != sequential")
    }
  }

  test("speculative engine corrects a DIVERGENT sample (mismatch path)") {
    // a 2-word sample of a 30-word corpus predicts a wrong trajectory —
    // the verify pass must truncate the prefix and commit exact
    // corrections, landing on the sequential trajectory regardless
    val rnd = new scala.util.Random(11)
    val docs = Seq.tabulate(150)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(4))(
        Seq.fill(1 + rnd.nextInt(7))("abcd".charAt(rnd.nextInt(4))).mkString)
        .mkString(" "))).toDF("id", "text")
    for (v <- Seq(0, 2, 5)) {
      val spec = TextStats.bpeTrain(docs, "text", 12, specBatch = 6, sampleWords = v)
      val seq = TextStats.bpeTrainSequential(docs, "text", 12)
      assert(spec == seq, s"sampleWords=$v: speculative != sequential")
    }
  }

  test("speculative engine: specBatch 0 degenerates to exact one-per-round") {
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("id", "text")
    val m = TextStats.bpeTrain(docs, "text", 5, specBatch = 0, sampleWords = 1)
    assert(m.merges == Seq(("a", "a", 2L), ("a", "b", 1L)))
  }

  test("bpeModel.vocab collapses duplicate surface forms to the smallest id") {
    val m = BpeModel(Seq("a", "b", "c"),
      Seq(("a", "b", 9L), ("ab", "c", 5L), ("b", "c", 4L), ("a", "bc", 3L)))
    // "abc" minted twice (rank 2: ab+c, rank 4: a+bc) → one entry, min id
    val v = m.vocab.toMap
    assert(v("abc") == 4L) // alphabet 0..2, rank-2 merge id = 3+2-1 = 4
    assert(m.vocab.size == m.vocab.map(_._1).distinct.size)
  }
}
