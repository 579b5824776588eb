package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** MMR diversified re-rank (s31): relevance-vs-redundancy greedy
  * selection — rank 1 is pure relevance, ties break on id, a
  * near-duplicate defers below a diverse document when λ prices
  * redundancy high enough, and the whole loop replays driver-side.
  */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The operator's exact cosine path: left-fold dot, sqrt norms,
    * one 6-dp round. NaN-guarded like the `when(qn*cn > 0, ...)`.
    */
  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.zip(a).map { case (x, y) => x * y }.sum)
    val nb = math.sqrt(b.zip(b).map { case (x, y) => x * y }.sum)
    r6(d / (na * nb))
  }

  /** Driver-side replay of the greedy loop over a tiny corpus. */
  private def replay(q: Seq[Double], cands: Seq[(Long, Seq[Double])],
                     k: Int, num: Long, den: Long)
      : Seq[(Long, Long, Double, Double, Double)] = {
    val rel = cands.map { case (id, v) => id -> cos(q, v) }.toMap
    val sim = (for ((ia, va) <- cands; (ib, vb) <- cands if ia != ib)
      yield (ia, ib) -> cos(va, vb)).toMap
    def score(r: Double, ms: Double): Double =
      r6((num.toDouble * r - (den - num).toDouble * ms) / den.toDouble)
    var selected = Vector.empty[Long]
    var out = Vector.empty[(Long, Long, Double, Double, Double)]
    for (rank <- 1 to k) {
      val rem = cands.map(_._1).filterNot(selected.contains)
      if (rem.nonEmpty) {
        val scored = rem.map { id =>
          val ms = if (selected.isEmpty) 0.0
            else selected.map(s => sim((id, s))).max
          (id, rel(id), ms, score(rel(id), ms))
        }
        val w = scored.minBy(x => (-x._4, x._1))
        selected :+= w._1
        out :+= ((rank.toLong, w._1, w._2, w._3, w._4))
      }
    }
    out
  }

  private def run(q: Seq[Double], cands: Seq[(Long, Seq[Double])],
                  k: Int, n: Int, num: Long = 7L, den: Long = 10L)
      : Seq[(Long, Long, Double, Double, Double)] = {
    val queries = Seq((100L, q)).toDF("vec_id", "embedding")
    val corpus = cands.toDF("vec_id", "embedding")
    val r = Similarity.mmrRerank(queries, corpus, k, n, num, den)
      .collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getDouble(4), x.getDouble(5)))
      .sortBy(_._1)
    graft.std.Materialize.releaseAll()
    r.toSeq
  }

  test("mmr: rank 1 is pure relevance; at λ = 0.5 a near-duplicate " +
    "defers below a diverse lower-relevance document") {
    val q = Seq(1.0, 0.0, 0.0)
    val d1 = 1L -> Seq(1.0, 0.2, 0.0)   // top relevance
    val d2 = 2L -> Seq(1.0, 0.22, 0.0)  // near-dup of d1, rel #2
    val d3 = 3L -> Seq(0.9, 0.0, 0.436) // diverse, rel #3
    val got = run(q, Seq(d1, d2, d3), k = 3, n = 3, num = 5L, den = 10L)
    // plain cosine order is 1, 2, 3; MMR flips ranks 2 and 3
    assert(cos(q, d1._2) > cos(q, d2._2) &&
      cos(q, d2._2) > cos(q, d3._2), "fixture must rank 1 > 2 > 3 on rel")
    assert(got.map(_._2) == Seq(1L, 3L, 2L), s"got $got")
    assert(got == replay(q, Seq(d1, d2, d3), 3, 5L, 10L),
      s"replay mismatch: $got")
  }

  test("mmr: equal scores break on the smaller candidate id, and a " +
    "picked duplicate maximally penalizes its twin") {
    val q = Seq(1.0, 0.0)
    val cands = Seq(1L -> Seq(1.0, 0.0), 5L -> Seq(0.9, 0.3),
      6L -> Seq(0.9, 0.3), 7L -> Seq(0.0, 1.0))
    val got = run(q, cands, k = 4, n = 4)
    assert(got.map(_._2) == Seq(1L, 5L, 6L, 7L), s"got $got")
    // the twin picked second ties its sibling's score exactly; the
    // sibling then carries max_prior_sim = 1.0 (identical vectors)
    assert(got(1)._3 == got(2)._3, "twins share relevance")
    assert(got(2)._4 == 1.0, s"twin's prior sim must be 1: $got")
    assert(got == replay(q, cands, 4, 7L, 10L), s"replay mismatch: $got")
  }

  test("mmr: differential vs the driver-side greedy replay on a " +
    "seeded corpus, default λ") {
    val rnd = new scala.util.Random(20260815L)
    val cands = (1L to 20L).map(i =>
      i -> Seq.fill(8)(rnd.nextInt(21).toDouble / 10.0 - 1.0))
    val q = Seq.fill(8)(rnd.nextInt(21).toDouble / 10.0 - 1.0)
    val got = run(q, cands, k = 4, n = 6)
    // replay over the SAME top-6 candidate cut the operator takes
    val top6 = cands.map { case (id, v) => (id, v, cos(q, v)) }
      .sortBy(x => (-x._3, x._1)).take(6).map(x => (x._1, x._2))
    val exp = replay(q, top6, 4, 7L, 10L)
    assert(got == exp, s"got $got expected $exp")
    assert(got.size == 4 && got.map(_._2).distinct.size == 4)
  }
}
