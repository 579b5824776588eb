package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** s34 rank-k All-but-the-Top: a 3-tier axis-aligned corpus where
  * rank-1 removal is insufficient (the second axis still dominates the
  * deflated corpus), the threshold stop fires exactly when the
  * remainder turns isotropic, and the k cap bounds the loop. The two
  * strong axes are separated enough (800 vs 72 vs 2·3) that the 6-dp
  * fixed-point iterate SNAPS to the exact axis within 8 iterations, so
  * the converged rows assert exact cells (the s33 spec discipline);
  * only the isotropic-remainder share is asserted with a tolerance
  * (three equal eigenvalues — the iterate is deterministic but never
  * axis-aligned, which is exactly why the loop must stop there).
  */
class AllButTopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // mean is exactly 0 on every axis; per-axis centered SS:
  // e1: 2·20² = 800, e2: 2·6² = 72, e3..e5: 2·1² = 2 each.
  // tss1 = 878, tss2 = 78, tss3 = 6.
  private def corpus = Seq(
    (1L, Seq(20.0, 0.0, 0.0, 0.0, 0.0)),
    (2L, Seq(-20.0, 0.0, 0.0, 0.0, 0.0)),
    (3L, Seq(0.0, 6.0, 0.0, 0.0, 0.0)),
    (4L, Seq(0.0, -6.0, 0.0, 0.0, 0.0)),
    (5L, Seq(0.0, 0.0, 1.0, 0.0, 0.0)),
    (6L, Seq(0.0, 0.0, -1.0, 0.0, 0.0)),
    (7L, Seq(0.0, 0.0, 0.0, 1.0, 0.0)),
    (8L, Seq(0.0, 0.0, 0.0, -1.0, 0.0)),
    (9L, Seq(0.0, 0.0, 0.0, 0.0, 1.0)),
    (10L, Seq(0.0, 0.0, 0.0, 0.0, -1.0)),
    (11L, Seq(0.0, 0.0, 0.0, 0.0, 0.0)),
    (12L, Seq(0.0, 0.0, 0.0, 0.0, 0.0)))
    .toDF("vec_id", "embedding")

  test("rank-1 is insufficient: the loop removes two ranks, then the " +
    "isotropic remainder stops it") {
    val r = Similarity.allButTopK(corpus, k = 3, varShareStop = 0.4,
      iters = 8).collect().sortBy(_.getInt(0))
    graft.std.Materialize.releaseAll()
    assert(r.length == 2, s"got ${r.toSeq}")
    val r1 = r(0); val r2 = r(1)
    // rank 1: nrm snaps to exactly 800 (e2/e1 ratio 0.09 decays past
    // 6 dp by iteration 7); λ = 800/12, shares over tss1 = 878
    assert(r1.getInt(0) == 1 && r1.getLong(1) == 12L)
    assert(r1.getDouble(2) == 66.666667, s"lambda1: $r1")
    assert(r1.getDouble(3) == 0.911162, s"var_share1: $r1")      // 800/878
    assert(r1.getDouble(4) == 0.911162, s"removed1: $r1")        // 800/878
    assert(r1.getDouble(5) == 0.923077, s"after1: $r1")          // 72/78
    // rank 2: the deflation zeroes e1 exactly (scores are ±20 exactly),
    // chain 2 snaps to e2 (minor/e2 ratio 1/36): nrm = 72, tss2 = 78
    assert(r2.getInt(0) == 2 && r2.getLong(1) == 12L)
    assert(r2.getDouble(2) == 6.0, s"lambda2: $r2")              // 72/12
    assert(r2.getDouble(3) == 0.923077, s"var_share2: $r2")      // 72/78
    assert(r2.getDouble(4) == 0.082005, s"removed2: $r2")        // 72/878
    // after rank 2 only the three EQUAL minor axes remain: the top-PC
    // share of an isotropic 3-space is 1/3 (n·λ = 2, tss3 = 6) — below
    // the 0.4 stop, which is the whole point. The iterate stays a
    // symmetric mix of the three axes, so 6-dp rounding leaves it
    // near-exact but not snapped: tolerance, not equality.
    assert(math.abs(r2.getDouble(5) - 1.0 / 3) < 2e-3, s"after2: $r2")
  }

  test("the k cap bounds the loop when the threshold never fires") {
    val r = Similarity.allButTopK(corpus, k = 2, varShareStop = 0.05,
      iters = 8).collect().sortBy(_.getInt(0))
    graft.std.Materialize.releaseAll()
    // share after rank 2 is ~1/3 >= 0.05, but k = 2 caps the loop
    assert(r.length == 2 && r.map(_.getInt(0)).toSeq == Seq(1, 2))
  }

  test("rank-1 row IS s33's report: the family shares its kernels") {
    // allButTopK at k = 1 and anisotropyRemovalReport run the same
    // powerIterate chains and deflation bridge, so every overlapping
    // cell must agree EXACTLY — a divergence means the loop rewired
    // the arithmetic instead of reusing it
    val s33 = Similarity.anisotropyRemovalReport(corpus, iters = 8)
      .collect().head
    val s34 = Similarity.allButTopK(corpus, k = 1, varShareStop = 0.4,
      iters = 8).collect().head
    graft.std.Materialize.releaseAll()
    assert(s34.getLong(1) == s33.getLong(0), "n_vectors")
    assert(s34.getDouble(2) == s33.getDouble(1), "lambda == lambda1")
    assert(s34.getDouble(3) == s33.getDouble(2),
      "var_share == var_share_before")
    assert(s34.getDouble(4) == s33.getDouble(5),
      "removed_var_share (rank 1 deflates off tss1)")
    assert(s34.getDouble(5) == s33.getDouble(4),
      "var_share_after == var_share_after")
  }

  test("empty corpus reports no rows, never a division error") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(Similarity.allButTopK(empty, k = 2, varShareStop = 0.4,
      iters = 2).collect().isEmpty)
    graft.std.Materialize.releaseAll()
  }
}
