package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** recall@k: hand-counted overlaps, zero-hit queries, fixed-point. */
class RecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("per-query overlap counts and the truncating fixed point") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L))
      .toDF("query_id", "neighbor_id")
    val ann = Seq((1L, 11L), (1L, 12L), (1L, 99L),
      (2L, 7L), (2L, 8L), (2L, 9L))
      .toDF("query_id", "neighbor_id")
    val r = Similarity.recallAtK(ann, exact, 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 2L)
    assert(r(1L).getLong(3) == 666666666L, "2/3 truncates, not rounds")
    assert(r(2L).getLong(1) == 0L && r(2L).getDouble(4) == 0.0,
      "a query the ANN missed entirely still reports")
    assert(r.values.forall(_.getInt(2) == 3))
  }

  test("truncation recall: misleading prefix misses, full width hits") {
    // corpus 3's 2-dim prefix is EXACTLY the query direction (cosine
    // 1.0) while its full vector points the other way; corpus 2 is
    // the true full-width neighbor. So the d'=2 top-1 picks 3 (a
    // miss) and d'=4 recovers 2 (a hit) — recall 0 then 1.
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 10.0)),
      (2L, Seq(0.5, 0.5, 0.0, 10.0)),
      (3L, Seq(1.0, 0.0, 0.0, -10.0)))
      .toDF("vec_id", "embedding")
    val r = Similarity.truncationRecall(
        vecs.filter($"vec_id" === 1L), vecs, 1, Seq(2, 4))
      .collect().map(x => x.getInt(0) -> x).toMap
    graft.std.Materialize.releaseAll()
    assert(r(2).getLong(1) == 1L && r(2).getLong(2) == 0L &&
      r(2).getLong(3) == 0L, s"prefix width 2 must miss: ${r(2)}")
    assert(r(4).getLong(2) == 1000000000L && r(4).getLong(3) == 1L &&
      r(4).getDouble(4) == 1.0, s"full width must hit: ${r(4)}")
  }

  test("ivfPqRerank: full candidate budget reduces to brute-force L2") {
    // cells=1, nprobe=1 puts the whole corpus in the probed cell and
    // candK >= |corpus| keeps every candidate, so the exact re-rank
    // must EQUAL bruteForceTopKL2 row for row — the documented
    // reduction that proves stage 2's arithmetic is the exact kernel.
    val vecs = (1L to 12L).map(i =>
      (i, Seq(i.toDouble, (i * 7 % 5).toDouble, (i * 3 % 7).toDouble)))
      .toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" <= 2L)
    val got = Similarity.ivfPqRerank(qs, vecs, k = 3, candK = 12,
        nprobe = 1, cells = 1, cellIters = 2, subspaces = 3,
        codewords = 4, pqIters = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = Similarity.bruteForceTopKL2(qs, vecs, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong,
        r.getDouble(3))).toSet
    graft.std.Materialize.releaseAll()
    assert(got == want, s"rerank with full budget must equal exact:\n" +
      s"got $got\nwant $want")
  }

  test("ivfPqRerank: exact re-rank corrects ADC order inside the set") {
    // k < candK: the final top-k is drawn from the candidate set by
    // EXACT distance, so every returned row must carry the true d2
    // and ranks must be dense ascending per query.
    val vecs = (1L to 20L).map(i =>
      (i, Seq((i % 4).toDouble, (i % 3).toDouble,
        (i % 5).toDouble, i.toDouble / 10)))
      .toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" <= 2L)
    val rows = Similarity.ivfPqRerank(qs, vecs, k = 4, candK = 10,
        nprobe = 2, cells = 2, cellIters = 2, subspaces = 2,
        codewords = 4, pqIters = 2)
      .collect()
    graft.std.Materialize.releaseAll()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(1L, 2L))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to 4L),
        s"ranks not dense for query $q")
      val d = sorted.map(_.getDouble(3))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b },
        s"exact distances must ascend with rank for query $q")
    }
  }
}
