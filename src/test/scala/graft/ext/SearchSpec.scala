package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BM25 retrieval (t29) semantics on a hand-checkable corpus. */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(qs: Seq[(Long, String)], docs: Seq[(Long, String)]) =
    Search.bm25TopK(docs.toDF("doc_id", "text"),
        qs.toDF("query_id", "qtext"), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap

  test("length normalization outranks raw term frequency") {
    // docB has tf(apple)=2 but is 3x longer; with b=0.75 the length
    // penalty wins: 2.2/1.791 > 4.4/3.773 (hand-computed denominators)
    val got = run(Seq((1L, "apple")), Seq(
      (10L, "apple banana"),
      (20L, "apple apple banana extra words here"),
      (30L, "cherry only text")))
    assert(got((1L, 1L)) == 10L)
    assert(got((1L, 2L)) == 20L)
    assert(!got.contains((1L, 3L))) // no apple in docC → never scored
  }

  test("multi-term queries sum per-term weights; duplicates count once") {
    val docs = Seq(
      (10L, "apple banana"),
      (20L, "banana cherry"),
      (30L, "cherry text cherry"))
    // both-terms doc beats single-term docs; "cherry cherry" scores
    // like "cherry" (query terms are distinct)
    val both = run(Seq((1L, "banana cherry")), docs)
    assert(both((1L, 1L)) == 20L)
    val dup = run(Seq((1L, "cherry cherry")), docs)
    val single = run(Seq((1L, "cherry")), docs)
    assert(dup == single)
  }

  test("top-k cut and deterministic doc_id tiebreak") {
    // 5 identical docs score identically → rank by doc_id; k=3 keeps 3
    val docs = (1L to 5L).map(i => (i, "same text here"))
    val got = Search.bm25TopK(docs.toDF("doc_id", "text"),
        Seq((1L, "same")).toDF("query_id", "qtext"), k = 3)
      .collect().map(r => r.getLong(3) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
