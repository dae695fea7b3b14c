package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed pins for the lexical-retrieval operators; the corpus-scale
  * behaviour is oracle-pinned by `x_inverted_index` / `x_bm25` /
  * `x_rrf_hybrid`. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "cat sat mat"),
    (2L, "cat cat dog"),
    (3L, "dog runs"),
    (4L, "bird sings loud songs")).toDF("doc_id", "text")

  test("termStats: df/cf/idf hand-computed, postings sample bounded and ascending") {
    val out = Retrieval.termStats(corpus, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    // cat: docs {1,2}, occurrences 3; idf = ln((4-2+0.5)/(2+0.5)+1) = ln 2
    assert(out("cat") === ((2L, 3L, 0.6931, "1,2")))
    assert(out("dog") === ((2L, 2L, 0.6931, "2,3")))
    // hapax: idf = ln((4-1+0.5)/(1+0.5)+1) = ln(10/3)
    assert(out("mat") === ((1L, 1L, 1.2040, "1")))
    assert(out.size === 9)

    val sampled = Retrieval.termStats(corpus, "doc_id", "text", sampleK = 1)
      .filter(col("term") === "cat").collect().head.getString(4)
    assert(sampled === "1", "sampleK must bound the posting sample pre-aggregation")
  }

  test("bm25TopK: hand-computed scores, ranking, and the no-match exclusion") {
    // query "cat dog": idf(cat)=idf(dog)=ln2; avgdl=3, k1=1.2, b=0.75.
    //  d2: ln2*(2/3.2 + 1/2.2) = 0.7483 ; d3 (dl=2): ln2/1.9 = 0.3648 ;
    //  d1: ln2/2.2 = 0.3151 ; d4: no term in common — absent, not zero.
    val q = Seq((99L, "cat dog")).toDF("q_id", "q_text")
    val out = Retrieval.bm25TopK(corpus, q, "doc_id", "text", "q_id", "q_text", k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1, 2L, 0.7483), (2, 3L, 0.3648), (3, 1L, 0.3151)))
  }

  test("bm25TopK: a query never retrieves its own document id") {
    val q = Seq((1L, "cat")).toDF("q_id", "q_text")
    val ids = Retrieval.bm25TopK(corpus, q, "doc_id", "text", "q_id", "q_text", k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(2L), s"doc 1 must be excluded from its own query: $ids")
  }

  test("bm25TopK: consecutive separators mint no empty terms (dl and tf exact)") {
    val noisy = Seq((1L, "cat  dog"), (2L, "cat")).toDF("doc_id", "text")
    val q = Seq((9L, "cat")).toDF("q_id", "q_text")
    val out = Retrieval.bm25TopK(noisy, q, "doc_id", "text", "q_id", "q_text", k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3)))
    // dl(d1)=2 not 3; avgdl=1.5; idf=ln((2-2+.5)/2.5+1)=ln1.2
    //  d2 (dl=1): ln1.2/(1+1.2*(0.25+0.75*1/1.5)) = ln1.2/1.9 = 0.096
    //  d1 (dl=2): ln1.2/(1+1.2*(0.25+0.75*2/1.5)) = ln1.2/2.5 = 0.0729
    assert(out.toSeq === Seq((2L, 0.096), (1L, 0.0729)))
  }

  test("tfidfTopK: hand-computed scores, tie-break by term, short docs keep < k rows") {
    // N=4; idf' = ln(4/(df+1)): df=1 → ln2 = 0.6931, df=2 → ln(4/3) = 0.2877
    val out = Retrieval.tfidfTopK(corpus, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getDouble(3))))
      .toMap
    assert(out((1L, 1)) === (("mat", 0.6931)))  // mat/sat tie at ln2 — term asc
    assert(out((1L, 2)) === (("sat", 0.6931)))
    assert(out((1L, 3)) === (("cat", 0.2877)))
    assert(out((2L, 1)) === (("cat", 0.5754)))  // tf=2 doubles the df=2 idf
    assert(out((2L, 2)) === (("dog", 0.2877)))
    assert(!out.contains((2L, 3)), "2-term doc must emit 2 rows, not a padded 3rd")
    assert(out((4L, 1)) === (("bird", 0.6931))) // 4-way tie resolved lexically
    assert(out((4L, 2)) === (("loud", 0.6931)))
    assert(out((4L, 3)) === (("sings", 0.6931)))
  }

  test("weightedSample: reproducible, scale-invariant in the weights, heavy rows win") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = spark.range(0, 200).toDF("doc_id")
      .withColumn("w", (col("doc_id") % 7 + 1).cast("double"))
    def ids(weight: org.apache.spark.sql.Column) =
      TextStats.weightedSample(docs, "doc_id", weight, k = 20)
        .select("doc_id").as[Long].collect().toSet
    val a = ids(col("w"))
    assert(a === ids(col("w")), "same weights must draw the same sample")
    assert(a === ids(col("w") * 1000), "A-ES selection is weight-scale invariant")
    // an overwhelming weight forces selection (key = ln(u)/w → 0⁻, the max)
    val heavy = ids(org.apache.spark.sql.functions
      .when(col("doc_id") === 13, lit(1e9)).otherwise(col("w")))
    assert(heavy.contains(13L), "a near-infinite weight must be drawn")
  }

  test("weightedSample: non-positive weights are dropped, not dominant") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // ln(u)/w with w < 0 is POSITIVE (beats every legit key ≤ 0) and
    // w = 0 can yield NaN (sorts FIRST descending) — without the filter
    // corrupt rows would silently sweep the sample (ADVICE r11)
    val docs = spark.range(0, 100).toDF("doc_id")
    val w = when(col("doc_id") < 50, lit(-1.0))
      .otherwise(when(col("doc_id") < 60, lit(0.0)).otherwise(lit(1.0)))
    val got = TextStats.weightedSample(docs, "doc_id", w, k = 30)
      .select("doc_id").as[Long].collect().toSet
    assert(got.size == 30)
    assert(got.forall(_ >= 60), s"non-positive-weight rows leaked: $got")
  }

  test("rrfFuse: shared docs sum both reciprocals; singletons keep one; ties break by doc") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q", "d", "r")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("q", "d", "r")
    val out = Retrieval.rrfFuse(a, b, "q", "d", "r", k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // 11: 1/62 + 1/61 = 0.032522 ; 10: 1/61 = 0.016393 ; 12: 1/62 = 0.016129
    assert(out.toSeq === Seq(
      (1, 11L, 0.032522), (2, 10L, 0.016393), (3, 12L, 0.016129)))
  }
}
