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
}
