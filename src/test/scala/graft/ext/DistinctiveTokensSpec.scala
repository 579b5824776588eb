package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Distinctive tokens: hand-computed lift, ranking, min-count gate. */
class DistinctiveTokensSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "srcA", "a a a b"),
    (2L, "srcB", "b b b b a")).toDF("doc_id", "source", "text")

  test("lift surfaces the locally over-represented token, exactly") {
    val r = TextAnalysis.distinctiveTokens(docs, topK = 2, minCount = 1L)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(4), x.getInt(6))).toMap
    // lift(A, a) = (3/4) / (4/9) = 27/16 = 1.6875
    assert(r(("srcA", "a")) == ((3L, 1687500000L, 1)))
    // lift(B, b) = (4/5) / (5/9) = 36/25 = 1.44
    assert(r(("srcB", "b")) == ((4L, 1440000000L, 1)))
    // the under-represented tokens rank second at 0.45
    assert(r(("srcA", "b"))._2 == 450000000L)
    assert(r(("srcB", "a"))._2 == 450000000L)
  }

  test("minCount suppresses small-sample noise before ranking") {
    val r = TextAnalysis.distinctiveTokens(docs, topK = 2, minCount = 3L)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    // only counts >= 3 survive: (A, a) and (B, b)
    assert(r == Set(("srcA", "a"), ("srcB", "b")))
  }
}
