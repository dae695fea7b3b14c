package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall at 10× the committed corpus (the ScaleGen sf1 data, 20k
  * vectors, K = 142 cells) — the measurement that surfaced the third
  * sizing law in round 11: a FIXED compressed-search budget collapses
  * as the corpus grows (ksub = 16 ADC recall fell 0.275 → 0.025; a
  * fixed top-20 rerank only recovers 0.200) while a budget sized to the
  * corpus restores it (ksub = 256 + rerank 100 → 0.850). This spec pins
  * the law as ORDERINGS with wide margins (robust to a testdata
  * regeneration, unlike point floors) and the probe-limited exact
  * searcher's scale-robustness.
  *
  * The scaled corpus is generated, not committed (`graft.ScaleGen` →
  * scratch/), so the suite CANCELS rather than fails when it is absent —
  * builder and driver boxes have it; a fresh clone does not. */
class AnnRecallAtScaleSpec extends SparkSpec {

  private val dir = "/root/repo/scratch/sf1"
  private val k = 5

  test("sf1: probe search holds; sized compressed budget beats the fixed one (the sizing law)") {
    assume(new java.io.File(s"$dir/embeddings.parquet").exists(),
      s"scaled corpus absent at $dir — run graft.ScaleGen first")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val n = emb.count()
    val kCents = math.ceil(math.sqrt(n.toDouble)).toInt
    val cents = emb.filter(col("vec_id") < kCents)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    val data = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toIndexedSeq))
    val qVecs = data.filter(_._1 < 8)
    def l2(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val l2Exact = qVecs.flatMap { case (q, qv) =>
      data.filter(_._1 != q)
        .sortBy { case (id, v) => (l2(qv, v), id) }.take(k)
        .map { case (id, _) => (q, id) }
    }.toSet
    def cos(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
      var s = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      s / math.sqrt(na * nb)
    }
    val cosExact = qVecs.flatMap { case (q, qv) =>
      data.filter(_._1 != q)
        .sortBy { case (id, v) => (-cos(qv, v), id) }.take(k)
        .map { case (id, _) => (q, id) }
    }.toSet
    def recall(df: DataFrame, exact: Set[(Long, Long)]): Double = {
      val s = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      s.intersect(exact).size.toDouble / exact.size
    }

    val probe = recall(Ann.ivfSearch(emb, queries, "vec_id", "embedding",
      cents, nprobe = 3, k = k), cosExact)
    val books16 = Ann.pqCodebooks(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val fixed = recall(Ann.ivfPqSearch(emb, queries, "vec_id", "embedding",
      cents, books16, nprobe = 8, k = k, rerank = 20), l2Exact)
    val books256 = Ann.pqCodebooksLloyd(emb, "vec_id", "embedding",
      m = 8, ksub = 256, iters = 1, sampleN = 8192)
    val sized = recall(Ann.ivfPqSearch(emb, queries, "vec_id", "embedding",
      cents, books256, nprobe = 8, k = k, rerank = 100), l2Exact)
    info(f"sf1 recall@5: ivf_probe3 = $probe%.3f, fixed budget " +
      f"(ksub16 + R20) = $fixed%.3f, sized budget (ksub256 + R100) = $sized%.3f")

    // measured r11: 0.975 / 0.200 / 0.850 — pinned as orderings with
    // margin so a data regeneration shifts the numbers, not the law
    assert(probe >= 0.9,
      s"probe-limited exact search lost scale-robustness: $probe")
    assert(sized >= fixed + 0.2,
      s"the sizing law inverted: sized $sized vs fixed $fixed")
    assert(sized >= 0.7,
      s"sized compressed search fell under its measured band: $sized")
  }
}
