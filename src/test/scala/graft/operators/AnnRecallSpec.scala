package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall@5 of every approximate ANN tier against its exact baseline on
  * the REAL sf0.1 embeddings (2,000 64-dim vectors, the same table and
  * configurations the oracle queries run) — a 100 TB ANN index is graded
  * on recall per unit cost, and before round 10 only cost was measured.
  * Floors sit just under the values measured in round 10 (published in
  * SCALING.md's recall table), so a quantiser or probe regression fails
  * loudly — the old 0.2 floors only caught total collapse.
  *
  * Baselines: probe-limited IVF ranks by true cosine, so its exact twin
  * is [[Ann.cosineTopK]]; PQ and IVF-PQ rank by approximate squared L2,
  * so their exact twin is the driver-computed exact-L2 top-5. */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"
  private val k = 5

  private def neighborSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet

  private def recall(approx: Set[(Long, Long)], exact: Set[(Long, Long)]): Double =
    approx.intersect(exact).size.toDouble / exact.size

  test("recall@5 on sf0.1 embeddings stays at the measured levels") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val n = emb.count()
    val kCents = math.ceil(math.sqrt(n.toDouble)).toInt
    val cents = emb.filter(col("vec_id") < kCents)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    val books = Ann.pqCodebooks(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val lloyd = Ann.pqCodebooksLloyd(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 1, sampleN = 256)

    // exact baselines
    val cosExact = neighborSet(
      Ann.cosineTopK(emb, queries, "vec_id", "embedding", k))
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

    // one Lloyd pass over the coarse quantizer (same seeding, same K,
    // K-sized 32·k sample — the fixed-256 config is a measured trap)
    val lloydCents = Ann.centroidsLloyd(emb, "vec_id", "embedding",
      kCents, iters = 1)

    val measured = Seq(
      ("ivf_probe3", neighborSet(Ann.ivfSearch(
        emb, queries, "vec_id", "embedding", cents, nprobe = 3, k = k)), cosExact),
      ("ivf_lloyd_probe3", neighborSet(Ann.ivfSearch(
        emb, queries, "vec_id", "embedding", lloydCents, nprobe = 3, k = k)), cosExact),
      ("ivf_probe8", neighborSet(Ann.ivfSearch(
        emb, queries, "vec_id", "embedding", cents, nprobe = 8, k = k)), cosExact),
      ("ivf_hier_probe3", neighborSet(Ann.ivfSearch(
        emb, queries, "vec_id", "embedding", cents, nprobe = 3, k = k,
        twoLevel = true)), cosExact),
      ("pq", neighborSet(Ann.pqSearch(
        emb, queries, "vec_id", "embedding", books, k = k)), l2Exact),
      ("pq_lloyd", neighborSet(Ann.pqSearch(
        emb, queries, "vec_id", "embedding", lloyd, k = k)), l2Exact),
      ("ivfpq_lloyd_probe3", neighborSet(Ann.ivfPqSearch(
        emb, queries, "vec_id", "embedding", cents, lloyd,
        nprobe = 3, k = k)), l2Exact),
      ("ivfpq_probe3", neighborSet(Ann.ivfPqSearch(
        emb, queries, "vec_id", "embedding", cents, books,
        nprobe = 3, k = k)), l2Exact),
      ("ivfpq_probe8", neighborSet(Ann.ivfPqSearch(
        emb, queries, "vec_id", "embedding", cents, books,
        nprobe = 8, k = k)), l2Exact),
      ("ivfpq_probe8_rerank", neighborSet(Ann.ivfPqSearch(
        emb, queries, "vec_id", "embedding", cents, books,
        nprobe = 8, k = k, rerank = 20)), l2Exact),
      ("ivfpq_res_probe3", neighborSet(Ann.ivfPqSearch(
        emb, queries, "vec_id", "embedding", cents,
        Ann.pqResidualCodebooks(emb, "vec_id", "embedding", cents,
          m = 8, ksub = 16),
        nprobe = 3, k = k, residual = true)), l2Exact),
      ("pq256_lloyd", neighborSet(Ann.pqSearch(
        emb, queries, "vec_id", "embedding",
        Ann.pqCodebooksLloyd(emb, "vec_id", "embedding", m = 8, ksub = 256,
          iters = 1, sampleN = 8192), k = k)), l2Exact))
    val recalls = measured.map { case (name, approx, exact) =>
      assert(approx.size == 8 * k, s"$name must return k results per query")
      name -> recall(approx, exact)
    }.toMap
    recalls.toSeq.sortBy(_._1).foreach { case (name, r) =>
      info(f"recall@5 $name%-16s = $r%.3f")
    }

    // floors: just under the measured values (SCALING.md table; r10 for
    // the carried configs, r11 for rerank/residual/pq256)
    val floors = Map(
      "ivf_probe3" -> 0.95, "ivf_probe8" -> 0.95, "ivf_hier_probe3" -> 0.50,
      "pq" -> 0.10, "ivfpq_probe3" -> 0.25, "ivfpq_probe8" -> 0.15,
      "pq_lloyd" -> 0.20, "ivfpq_lloyd_probe3" -> 0.30,
      "ivf_lloyd_probe3" -> 0.90,
      "ivfpq_probe8_rerank" -> 0.55, "ivfpq_res_probe3" -> 0.15,
      "pq256_lloyd" -> 0.25)
    floors.foreach { case (name, floor) =>
      assert(recalls(name) >= floor,
        s"$name recall@5 ${recalls(name)} fell under its measured floor $floor")
    }
    // the ADC recall INVERSION and its cure: more probes admit more
    // quantisation-error false candidates, so raw ivfpq recall can FALL
    // as nprobe rises (probe8 0.200 < probe3 0.275, round 10); exact
    // re-ranking of the ADC top-R must restore monotonicity — a user
    // turning nprobe up with rerank on gets at least probe3's quality
    assert(recalls("ivfpq_probe8_rerank") >= recalls("ivfpq_probe3"),
      s"exact re-ranking no longer cures the ADC inversion: " +
        s"probe8+rerank ${recalls("ivfpq_probe8_rerank")} < " +
        s"probe3 ${recalls("ivfpq_probe3")}")
  }

  test("centroidsLloyd(iters = 0) is exactly the first-K-by-id seeding") {
    // pins the seeding equivalence the oracle relies on: the Lloyd
    // refinement starts from the SAME centroids (same ids, same vectors
    // cast to double) as ivfCentroids' vec_id < K filter on dense ids
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val kCents = math.ceil(math.sqrt(emb.count().toDouble)).toInt
    val seeds = emb.filter(col("vec_id") < kCents)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    val unrefined = Ann.centroidsLloyd(emb, "vec_id", "embedding",
      kCents, iters = 0)
    assert(unrefined == seeds)
  }

  test("the 32·k sample rule holds cell balance; a starved sample collapses it") {
    // Σpop² is the cost an all-pairs IVF consumer pays and the variance
    // a probe-limited one inherits. Measured on this unit-norm corpus
    // (first-K seeds drawn from the same distribution as the data), one
    // SIZED Lloyd pass is balance-neutral — the refinement's win here is
    // the PQ codebooks', not the coarse quantizer's — but a SAMPLE-
    // STARVED pass (fixed 256 ≈ 6 members/cell, the PQ default
    // transplanted naively) shrinks cell means toward the global mean in
    // unlucky directions and SKEWS Σpop² ~1.38× while halving probe
    // recall. Pin both sides: the sizing rule stays within noise of the
    // flat seeding, and the trap it guards against stays reproducible.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val kCents = math.ceil(math.sqrt(emb.count().toDouble)).toInt
    val seeds = emb.filter(col("vec_id") < kCents)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    def sumPopSq(cents: Seq[(Long, Seq[Double])]): Long =
      emb.withColumn("cell", graft.functions.ArrayMath.nearestCentroid(
          col("embedding"), cents.map(_._1), cents.map(_._2)))
        .groupBy("cell").count()
        .agg(sum(col("count") * col("count"))).head.getLong(0)
    val flat = sumPopSq(seeds)
    val sized = sumPopSq(Ann.centroidsLloyd(emb, "vec_id", "embedding",
      kCents, iters = 1))
    val starved = sumPopSq(Ann.centroidsLloyd(emb, "vec_id", "embedding",
      kCents, iters = 1, sampleN = 256))
    info(f"sum(pop^2) flat = $flat%d, sized 32k sample = $sized%d " +
      f"(${sized.toDouble / flat}%.3fx), starved 256 sample = $starved%d " +
      f"(${starved.toDouble / flat}%.3fx)")
    assert(sized <= (flat * 1.05).toLong,
      s"a sized Lloyd pass must not skew cells: $sized vs flat $flat")
    // DATA CHARACTERIZATION, not a regression gate (round-10 ADVICE): the
    // starved trap is a property of this corpus's distribution — a
    // testdata regeneration or jitter change can legitimately stop
    // reproducing it without any code regression. The sized upper bound
    // above stays hard; the trap's reproduction is reported, so the day
    // it vanishes is visible without failing CI.
    if (starved > (flat * 1.2).toLong)
      info("starved-sample trap reproduces (as measured in round 10)")
    else
      info(s"NOTE: the starved-sample trap no longer reproduces on this " +
        s"corpus ($starved vs flat $flat) — re-measure and reconsider " +
        "the 32x default sizing rule")
  }
}
