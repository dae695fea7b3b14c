package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Validates [[Ann.pqParamsFor]]'s DIRECTION on a corpus family the rule
  * was NOT fitted to — the residual honesty gap its scaladoc names (the
  * coefficients come from the md5-jitter testdata embeddings; two points
  * define a line, not a law). This corpus is a deterministic Gaussian
  * mixture with sharply different geometry: dim 32 (not 64), 12 heavy
  * anisotropic clusters (not per-id jitter), LCG-seeded so every run
  * sees the same vectors.
  *
  * What it pins is the LAW'S FORM, not the testdata's numbers: at 10×
  * the corpus under a FIXED small budget (ksub 16, R = 4k — exactly the
  * configuration that collapsed 0.275 → 0.025 on the testdata family),
  * recall must not beat the pqParamsFor-sized budget (ksub/R grown with
  * n); and the sized budget must hold a usable floor where the fixed
  * one is allowed to decay. Floors sit just under this suite's own
  * measured values (convention: measure, then pin). */
class PqSizingSecondCorpusSpec extends SparkSpec {

  private val dim = 32
  private val k = 5

  /** Deterministic mixture: cluster c's centre is an LCG ray; members
    * add per-coordinate noise at 0.35 of the centre scale — overlapping
    * but structured, unlike the testdata's near-orthogonal jitter. */
  private def corpus(n: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(9173)
    val centres = Seq.fill(12)(Array.fill(dim)(rnd.nextGaussian()))
    (0 until n).map { i =>
      val c = centres(i % 12)
      val r = new scala.util.Random(1000003L * i + 17)
      (i.toLong, c.indices.map(d => (c(d) + 0.35 * r.nextGaussian()).toFloat).toSeq)
    }
  }

  private def recallAt(n: Int, ksub: Int, r: Int): Double = {
    import spark.implicits._
    val data = corpus(n)
    val emb = data.toDF("vec_id", "embedding").repartition(4)
    val queries = emb.filter(col("vec_id") < 8)
    val kCents = math.ceil(math.sqrt(n.toDouble)).toInt
    val cents = data.take(kCents)
      .map { case (id, v) => (id, v.map(_.toDouble).toSeq) }
    val books = Ann.pqCodebooksLloyd(emb, "vec_id", "embedding",
      m = 8, ksub = ksub, iters = 1, sampleN = 32 * ksub)
    val approx = Ann.ivfPqSearch(emb, queries, "vec_id", "embedding",
        cents, books, nprobe = 8, k = k, rerank = r)
      .collect().map(row => (row.getLong(0), row.getLong(2))).toSet
    // exact L2 top-5, driver-side (n·dim doubles — trivial at these sizes)
    val dd = data.map { case (id, v) => (id, v.map(_.toDouble).toArray) }
    val exact = dd.filter(_._1 < 8).flatMap { case (q, qv) =>
      dd.filter(_._1 != q).map { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < dim) { val d = qv(i) - v(i); s += d * d; i += 1 }
        (s, id)
      }.sorted.take(k).map { case (_, id) => (q, id) }
    }.toSet
    approx.intersect(exact).size.toDouble / exact.size
  }

  test("pqParamsFor's form holds on an unfitted corpus family") {
    val nSmall = 2000
    val nBig = 20000
    val (ksubS, rS) = Ann.pqParamsFor(nSmall, k)
    val (ksubB, rB) = Ann.pqParamsFor(nBig, k)
    val fixedSmall = recallAt(nSmall, ksub = 16, r = 4 * k)
    val fixedBig = recallAt(nBig, ksub = 16, r = 4 * k)
    val sizedSmall = recallAt(nSmall, ksubS, rS)
    val sizedBig = recallAt(nBig, ksubB, rB)
    info(f"fixed (16, ${4 * k}): recall@5 $fixedSmall%.3f at n=$nSmall, " +
      f"$fixedBig%.3f at n=$nBig")
    info(f"sized ($ksubS, $rS)/($ksubB, $rB): recall@5 $sizedSmall%.3f " +
      f"at n=$nSmall, $sizedBig%.3f at n=$nBig")
    // the law's form: at 10x the corpus the grown budget is at least as
    // good as the fixed one, and holds a usable floor
    assert(sizedBig >= fixedBig,
      s"sized budget ($sizedBig) lost to the fixed one ($fixedBig) at n=$nBig")
    // measured on this spec's own corpus: fixed decays 0.250 -> 0.125 at
    // 10x while the sized budget reaches 0.950 — floor just under
    assert(sizedBig >= 0.90,
      s"sized budget no longer holds its measured floor at n=$nBig: $sizedBig")
  }
}
