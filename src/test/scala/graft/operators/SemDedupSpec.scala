package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Ann.semDedup]] — the keep-farthest-from-centroid policy, the
  * lexicographic (ccos, id) drop rule, the (cell, bucket) candidate
  * scoping, and the strongest-witness selection, each pinned on a
  * hand-checkable fixture. The cross-engine hash is pinned separately by
  * the `x_semdedup` oracle row. */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  // Two well-separated clusters on the first two axes of a 4-dim space.
  // Within cluster A: a0 sits ON the centroid direction, a1/a2 are the
  // same direction with a slight tilt (near-dups of a0 and each other);
  // aFar shares the cell but points away enough to stay below tau.
  // Cluster B holds one near-dup pair.
  private val dim = 4
  private def v(xs: Double*): Seq[Double] = xs.padTo(dim, 0.0)

  private val cents = Seq(
    0L -> v(1.0, 0.0),
    1L -> v(0.0, 1.0))

  private val vecs = Seq(
    (10L, v(10.0, 0.0)),          // a0: ccos 1.0 (farthest-kept candidate)
    (11L, v(10.0, 0.5)),          // a1: near-dup of a0, higher ccos? no —
                                  //     tilt LOWERS ccos vs a0's 1.0? cos
                                  //     to (1,0) = 10/sqrt(100.25) ≈ .9988
    (12L, v(10.0, 1.0)),          // a2: cos to cent ≈ .9950
    (13L, v(1.0, 0.9)),           // aFar: same cell (x>y), low cos to a0
    (20L, v(0.0, 5.0)),           // b0: ccos 1.0
    (21L, v(0.2, 5.0)))           // b1: near-dup of b0, ccos ≈ .9992
    .toDF("vec_id", "embedding")

  // One plane that does not separate the near-dup pairs: sign of the sum
  // direction keeps every fixture vector in one bucket per cell.
  private val planes = Seq(Seq.fill(dim)(1))

  private def run(tau: Double) =
    Ann.semDedup(vecs, "vec_id", "embedding", cents, planes, tau)
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))

  test("keep-farthest-from-centroid: the lowest-ccos member survives, " +
       "near-dup partners with higher ccos are dropped") {
    val got = run(tau = 0.99)
    val droppedIds = got.map(_._1).toSet
    // Cluster A: ccos order is a2 (.9950) < a1 (.9988) < a0 (1.0) on the
    // rounded 4-dp values; pairwise cosines a0·a1 ≈ .9988, a1·a2 ≈ .9994,
    // a0·a2 ≈ .995 — all ≥ .99, so a2 is kept (lowest ccos) and both a0
    // and a1 are dropped (each has a lower-ccos near-dup partner).
    assert(droppedIds.contains(10L) && droppedIds.contains(11L))
    assert(!droppedIds.contains(12L), "the farthest-from-centroid member must survive")
    // aFar's cosine to the cluster-A core is far below tau: never dropped
    assert(!droppedIds.contains(13L))
    // Cluster B: b1 (ccos .9992) < b0 (1.0) → b0 dropped, b1 kept
    assert(droppedIds.contains(20L) && !droppedIds.contains(21L))
  }

  test("witness is the strongest surviving partner (max cosine, tie -> smaller id)") {
    val got = run(tau = 0.99).map(r => r._1 -> r).toMap
    // a0's candidates: a1 (cos ≈ .9988) and a2 (cos ≈ .9950) both have
    // lower ccos → witness must be a1, the higher-cosine one
    assert(got(10L)._4 == 11L, s"expected witness 11 for 10, got ${got(10L)}")
    // b0's only lower-ccos partner is b1
    assert(got(20L)._4 == 21L)
  }

  test("drop rows carry the dropped member's own cell and rounded ccos") {
    val got = run(tau = 0.99).map(r => r._1 -> r).toMap
    assert(got(10L)._2 == 0L && got(20L)._2 == 1L)
    assert(got(10L)._3 == 1.0)
    assert(got(20L)._3 == 1.0)
    assert(got(10L)._5 >= 0.99 && got(20L)._5 >= 0.99)
  }

  test("tau gates the pair, not the assignment: raising tau empties the drop list") {
    assert(run(tau = 0.9999).isEmpty ||
      run(tau = 0.9999).forall(_._5 >= 0.9999))
    assert(run(tau = 1.1).isEmpty)
  }

  test("plan shape: shuffle-hash pair join over the checkpointed signature, " +
       "never a cartesian or a corpus broadcast") {
    // The signature build (argmin + broadcast centroid join) materialises
    // eagerly at the localCheckpoint, so the FINAL plan is exactly the
    // pair join + policy filter + witness aggregate over the checkpoint.
    val df = Ann.semDedup(vecs, "vec_id", "embedding", cents, planes, 0.99)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), s"cartesian in plan:\n$phys")
    assert(!phys.contains("BroadcastHashJoin"),
      s"pair join must not broadcast a corpus side:\n$phys")
    assert(phys.contains("ShuffledHashJoin"), s"pair join must be shuffle-hash:\n$phys")
  }
}
