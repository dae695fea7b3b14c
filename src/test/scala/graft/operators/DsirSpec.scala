package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextStats.dsirLogRatios]] / [[TextStats.dsirScore]] /
  * [[TextStats.dsirSelect]] (DSIR, Xie et al. 2023) and
  * [[TextStats.perplexityBuckets]] (CCNet tiers). The cross-engine
  * hashes are pinned by the `x_dsir_select` / `x_ppl_buckets` oracle
  * rows; these tests pin the behavioural contracts on hand-sized
  * fixtures where the expected direction is derivable by eye. */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  // Target rows speak "alpha beta"; raw-only rows speak "gamma delta".
  // DSIR must rank an unseen alpha-beta doc above a gamma-delta one.
  private val docs = Seq(
    (1L, "alpha beta alpha beta", true),
    (2L, "alpha beta alpha", true),
    (3L, "gamma delta gamma delta", false),
    (4L, "gamma delta gamma", false),
    (5L, "alpha beta", false),   // raw doc that LOOKS like the target
    (6L, "gamma delta", false),  // raw doc that does not
    (7L, "", false))             // featureless
    .toDF("doc_id", "text", "is_tgt")

  test("log-ratios: target-heavy features score positive, raw-only negative") {
    val lam = TextStats.dsirLogRatios(docs, "text", col("is_tgt"), buckets = 64)
    assert(lam.length == 64)
    val scored = TextStats.dsirScore(docs, "doc_id", "text", lam)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(5L) > 0, s"target-like doc must score positive, got ${scored(5L)}")
    assert(scored(6L) < 0, s"raw-only doc must score negative, got ${scored(6L)}")
    assert(scored(5L) > scored(6L))
    assert(scored(7L) == 0.0, "featureless doc carries no evidence")
  }

  test("selection takes the k most target-like docs, id tie-broken") {
    val top = TextStats.dsirSelect(docs, "doc_id", "text",
      col("is_tgt"), k = 3, buckets = 64)
      .collect().map(_.getLong(0)).toSet
    // the three pure alpha-beta docs outrank every gamma-delta one
    assert(top == Set(1L, 2L, 5L), s"got $top")
  }

  test("score is the feature-count-weighted sum: doubling the doc doubles logw") {
    val lam = TextStats.dsirLogRatios(docs, "text", col("is_tgt"), buckets = 64)
    val two = Seq((1L, "alpha beta"), (2L, "alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val s = TextStats.dsirScore(two, "doc_id", "text", lam)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // doc 2 = doc 1 twice: 2x unigrams, and 3 bigrams vs 1 (the seam
    // bigram "beta alpha" joins the copies) — n_features 7 vs 3
    assert(s(1L)._1 == 3 && s(2L)._1 == 7)
    assert(math.abs(s(2L)._2) > math.abs(s(1L)._2))
  }

  test("empty target selection fails loudly, not with silent NaN weights") {
    intercept[IllegalArgumentException] {
      TextStats.dsirLogRatios(docs, "text", lit(false), buckets = 64)
    }
  }

  test("dsirScore plans with zero exchanges — one native pass per row") {
    val lam = TextStats.dsirLogRatios(docs, "text", col("is_tgt"), buckets = 64)
    val plan = TextStats.dsirScore(docs, "doc_id", "text", lam)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  // ---- CCNet perplexity tiers ----

  private val tiered = Seq(
    // en: three fluency levels — repeated common bigrams score higher
    (10L, "the cat sat on the mat the cat sat on the mat", "en"),
    (11L, "the cat sat on the mat", "en"),
    (12L, "mat the on sat cat the", "en"),
    // fr: two docs; ntile(3) over 2 rows -> buckets 1 and 2
    (20L, "le chat le chat le chat", "fr"),
    (21L, "chat le bord du toit", "fr"),
    (30L, "single", "de")) // one token: no bigrams, absent from output
    .toDF("doc_id", "text", "lang")

  test("per-language equal-population tiers; head = most fluent") {
    val rows = TextStats.perplexityBuckets(tiered, "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getInt(4), r.getString(5)))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(rows.length == 5, s"the 1-token doc must be absent, got ${byId.keySet}")
    assert(!byId.contains(30L))
    // en: 3 docs into 3 tiers — one per tier, in DESCENDING LM-score
    // order (tier is derived from the score the operator itself
    // publishes; score parity is the x_bigram_logprob oracle's pin)
    val en = rows.filter(_._2 == "en").sortBy(r => (-r._3, r._1))
    assert(en.map(_._4).toSeq == Seq(1, 2, 3), s"got $en")
    assert(en.map(_._5).toSeq == Seq("head", "middle", "tail"))
    // fr: 2 rows into 3 tiers -> 1 and 2, never 3 (ntile contract);
    // the higher-scoring doc takes the head
    val fr = rows.filter(_._2 == "fr").sortBy(r => (-r._3, r._1))
    assert(fr.map(_._4).toSeq == Seq(1, 2), s"got $fr")
  }

  test("tier window partitions by language — never an all-rows window") {
    val plan = TextStats.perplexityBuckets(tiered, "doc_id", "text", "lang")
      .queryExecution.executedPlan.toString
    val winSpecs = "ntile\\(3\\) windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty && winSpecs.forall(_.startsWith("lang")),
      s"the tier window must partition by the stratum, got $winSpecs in:\n$plan")
  }
}
