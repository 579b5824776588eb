package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** t74 cross-source shingle overlap: hand-traced matrix arithmetic,
  * the containment-catches-a-subset-mirror case Jaccard misses, and
  * the maxSources background cap filtering BEFORE pairing.
  */
class SourceOverlapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def matrixOf(docs: Seq[(Long, String, String)],
                       maxSources: Int = 64)
      : Map[(String, String), (Long, Long, Long, Long, Long, Long, String)] =
    TextAnalysis.sourceOverlapMatrix(
        docs.toDF("doc_id", "source", "text"), 3, maxSources)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getString(8)))).toMap

  test("hand-traced matrix: one shared shingle, zero-overlap pairs " +
    "present with distinct verdicts") {
    val docs = Seq(
      (1L, "s1", "a b c d"),  // shingles: "a b c", "b c d"
      (2L, "s2", "a b c e"),  // shingles: "a b c", "b c e"
      (3L, "s3", "x y z w"))  // shingles: "x y z", "y z w"
    val got = matrixOf(docs)
    assert(got == Map(
      // shared {"a b c"}: jaccard 1/3, containments 1/2 each —
      // greatest 5e8 trips the mirror verdict on these tiny docs
      ("s1", "s2") -> ((1L, 2L, 2L, 333333333L, 500000000L,
        500000000L, "mirror")),
      ("s1", "s3") -> ((0L, 2L, 2L, 0L, 0L, 0L, "distinct")),
      ("s2", "s3") -> ((0L, 2L, 2L, 0L, 0L, 0L, "distinct"))),
      s"got $got")
  }

  test("containment catches the subset mirror Jaccard misses") {
    val docs = Seq(
      (1L, "big", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 8 shingles
      (2L, "sub", "t1 t2 t3 t4"))                    // 2, both in big
    val got = matrixOf(docs)
    val (shared, na, nb, j, ca, cb, verdict) = got(("big", "sub"))
    assert((shared, na, nb) == ((2L, 8L, 2L)), s"got $got")
    assert(j == 250000000L && j < 500000000L,
      s"jaccard alone would miss the mirror: $got")
    assert(cb == 1000000000L && ca == 250000000L, s"got $got")
    assert(verdict == "mirror", s"got $got")
  }

  test("the maxSources cap drops background shingles BEFORE pairing") {
    // "a b c" lives in all three sources; at cap 2 it is background,
    // sa/sb lose their only shingle (absent from the report) and sc's
    // lone survivor has no partner -> empty matrix
    val docs = Seq(
      (1L, "sa", "a b c"),
      (2L, "sb", "a b c"),
      (3L, "sc", "a b c"),
      (4L, "sc", "q r s"))
    assert(matrixOf(docs, maxSources = 2).isEmpty)
    // at the default cap the shared shingle counts everywhere
    val open = matrixOf(docs)
    assert(open(("sa", "sb")) ==
      ((1L, 1L, 1L, 1000000000L, 1000000000L, 1000000000L, "mirror")),
      s"got $open")
    assert(open(("sa", "sc"))._1 == 1L && open(("sb", "sc"))._1 == 1L,
      s"got $open")
  }
}
