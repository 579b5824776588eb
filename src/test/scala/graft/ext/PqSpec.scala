package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Product-quantization report (s15): hand-computed codebooks and
  * errors, nearest-codeword reassignment, tie-breaks, subspace split.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double], Int)*) =
    rows.toSeq.toDF("vec_id", "embedding", "label")

  test("hand-computed codebook and per-subspace errors") {
    // label 0 centroid (0, 1); label 1 centroid (10, 11)
    val df = vecs(
      (1L, Seq(0.0, 0.0), 0), (2L, Seq(0.0, 2.0), 0),
      (3L, Seq(10.0, 10.0), 1), (4L, Seq(10.0, 12.0), 1))
    // subspaces = 2 over 2 dims: sub 0 = dim 0 (errors all 0),
    // sub 1 = dim 1 (every vector off its centroid by exactly 1)
    val r = Similarity.pqReport(df, subspaces = 2).collect()
      .map(x => x.getInt(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))
      .toMap
    graft.std.Materialize.releaseAll()
    assert(r(0) == ((4L, 2L, 0.0, 0.0)))
    assert(r(1) == ((4L, 2L, 1.0, 1.0)))
    // subspaces = 1: one report row, per-dim mse averages both dims
    val one = Similarity.pqReport(df, subspaces = 1).collect()
    graft.std.Materialize.releaseAll()
    assert(one.length == 1 && one(0).getDouble(3) == 0.5 &&
      one(0).getDouble(4) == 1.0)
  }

  test("a mislabeled vector is assigned its NEAREST codeword, not its label") {
    // vec 3 carries label 0 but sits on cluster 1; forced own-label
    // assignment would cost ~8800 SSE against label 0's dragged
    // centroid — nearest-codeword assignment keeps the worst SSE tiny
    val df = vecs(
      (1L, Seq(0.0, 0.0), 0), (2L, Seq(0.0, 2.0), 0),
      (3L, Seq(100.0, 100.0), 0),
      (4L, Seq(100.0, 100.0), 1), (5L, Seq(100.0, 102.0), 1))
    val r = Similarity.pqReport(df, subspaces = 1).collect()(0)
    graft.std.Materialize.releaseAll()
    assert(r.getLong(1) == 5L && r.getLong(2) == 2L)
    // worst SSE is an HONEST label-0 member paying for the dragged
    // centroid (33.333333, 34): (0,0) costs 33.333333² + 34² =
    // 2267.111089. Had vec 3 been forced to its own label it would
    // have paid 66.666667² + 66² ≈ 8800.9 — the assert pins the
    // reassignment by excluding that cost from the report
    assert(r.getDouble(4) == 2267.111088889,
      s"max_vec_sse ${r.getDouble(4)}")
    assert(r.getDouble(4) < 8800.0,
      "mislabeled vector paid its own-label cost — no reassignment")
  }

  test("identical codebooks tie to the smallest codeword id") {
    val df = vecs(
      (1L, Seq(5.0, 5.0), 0), (2L, Seq(5.0, 5.0), 0),
      (3L, Seq(5.0, 5.0), 1), (4L, Seq(5.0, 5.0), 1))
    val r = Similarity.pqReport(df, subspaces = 2).collect()
    graft.std.Materialize.releaseAll()
    assert(r.forall(_.getLong(2) == 1L),
      "tied codewords must collapse to the smallest id")
    assert(r.forall(_.getDouble(3) == 0.0))
  }

  test("ivfPqTopK: nprobe=1 confines candidates to the probed cell") {
    // two far-apart cells; the query's own cell wins the probe, so
    // cell-b vectors never appear however close their codes might rank
    val corpus = Seq(
      (1L, Seq(0.0, 0.0), "a", 0), (2L, Seq(0.0, 2.0), "a", 0),
      (3L, Seq(100.0, 100.0), "b", 1), (4L, Seq(100.0, 102.0), "b", 1))
      .toDF("vec_id", "embedding", "cell", "label")
    val queries = corpus.filter($"vec_id" === 2L)
    val r = Similarity.ivfPqTopK(queries, corpus, k = 3, nprobe = 1,
      subspaces = 1).collect()
    graft.std.Materialize.releaseAll()
    assert(r.length == 1, s"only the probed cell's OTHER member: ${r.toSeq}")
    assert(r(0).getLong(0) == 2L && r(0).getLong(1) == 1L &&
      r(0).getInt(2) == 1)
    // adc(query (0,2) -> id1's codeword (0,1)) = 0 + 1 = 1 exactly
    assert(r(0).getDouble(3) == 1.0)
  }

  test("ivfPqTopK: on perfectly clustered data ADC is the exact distance") {
    // every vector IS its codeword, so the reconstruction-space
    // distance equals the true squared L2 — adc(1->3) = 4^2 + 4^2 = 32
    val corpus = Seq(
      (1L, Seq(1.0, 2.0), "a", 0), (2L, Seq(1.0, 2.0), "a", 0),
      (3L, Seq(5.0, 6.0), "a", 1), (4L, Seq(5.0, 6.0), "a", 1))
      .toDF("vec_id", "embedding", "cell", "label")
    val queries = corpus.filter($"vec_id" === 1L)
    val r = Similarity.ivfPqTopK(queries, corpus, k = 3, nprobe = 1,
      subspaces = 2).collect().sortBy(_.getInt(2))
    graft.std.Materialize.releaseAll()
    assert(r.map(_.getLong(1)).toSeq == Seq(2L, 3L, 4L),
      "rank by (adc, neighbor id): the twin first, then the far pair")
    assert(r(0).getDouble(3) == 0.0)
    assert(r(1).getDouble(3) == 32.0 && r(2).getDouble(3) == 32.0)
  }

  test("exact-L2 baseline + recall: clustered data scores recall 1.0") {
    // two tight clusters: the query's true top-2 ARE its
    // cluster-mates, the probe finds their cell, PQ codes separate
    // the clusters — so IVF-PQ recovers the exact result entirely
    val corpus = Seq(
      (1L, Seq(0.0, 1.0), "a", 0), (2L, Seq(0.0, 1.1), "a", 0),
      (3L, Seq(0.1, 1.0), "a", 0),
      (4L, Seq(9.0, 9.0), "b", 1), (5L, Seq(9.0, 9.1), "b", 1))
      .toDF("vec_id", "embedding", "cell", "label")
    val queries = corpus.filter($"vec_id" === 1L)
    val exact = Similarity.bruteForceTopKL2(queries, corpus, 2)
      .collect().sortBy(_.getInt(2))
    // both mates sit at rounded dist2 = 0.01 — the tie breaks id-asc
    assert(exact.map(_.getLong(1)).toSeq == Seq(2L, 3L),
      s"tied distances must rank by neighbor id: ${exact.toSeq}")
    val rec = Similarity.recallAtK(
      Similarity.ivfPqTopK(queries, corpus, k = 2, nprobe = 1,
        subspaces = 2),
      Similarity.bruteForceTopKL2(queries, corpus, 2), 2).collect()
    graft.std.Materialize.releaseAll()
    assert(rec.length == 1 && rec(0).getDouble(4) == 1.0,
      s"clustered recall must be perfect: ${rec.toSeq}")
  }

  test("round-robin subspace split covers every dimension exactly once") {
    // 5 dims over 2 subspaces: sub 0 gets dims {0,2,4}, sub 1 {1,3}
    val df = vecs((1L, Seq(1.0, 2.0, 3.0, 4.0, 5.0), 0))
    val r = Similarity.pqReport(df, subspaces = 2).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    graft.std.Materialize.releaseAll()
    assert(r.keySet == Set(0, 1))
    // single vector: its own centroid reconstructs it exactly
    val full = Similarity.pqReport(df, subspaces = 2).collect()
    graft.std.Materialize.releaseAll()
    assert(full.forall(_.getDouble(3) == 0.0))
  }
}
