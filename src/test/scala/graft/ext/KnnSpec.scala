package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** k-NN classification: cluster recovery, the correct flag, and the
  * deterministic vote tiebreak.
  */
class KnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, Array(1.0, 0.0), 0), (2L, Array(0.9, 0.1), 0),
    (3L, Array(1.0, 0.1), 0),
    (4L, Array(0.0, 1.0), 1), (5L, Array(0.1, 0.9), 1),
    (6L, Array(0.1, 1.0), 1)).toDF("vec_id", "embedding", "label")

  test("majority vote recovers the cluster; correct flag tracks truth") {
    val queries = Seq(
      (10L, Array(1.0, 0.05), 0),  // in cluster 0, labeled 0 -> correct
      (11L, Array(0.05, 1.0), 0))  // in cluster 1, labeled 0 -> wrong
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.knnClassify(queries, corpus, 3)
      .collect().map(x => x.getLong(0) ->
        (x.getInt(1), x.getInt(2), x.getLong(3), x.getBoolean(4))).toMap
    assert(r(10L) == ((0, 0, 3L, true)))
    assert(r(11L) == ((0, 1, 3L, false)))
  }

  test("tied votes resolve to the smallest label") {
    // query equidistant from one label-0 and one label-1 vector
    val tiny = Seq(
      (1L, Array(1.0, 0.0), 1), (2L, Array(0.0, 1.0), 0))
      .toDF("vec_id", "embedding", "label")
    val q = Seq((10L, Array(1.0, 1.0), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.knnClassify(q, tiny, 2).collect()
    assert(r.length == 1)
    assert(r(0).getInt(2) == 0, "1-1 vote must pick the smaller label")
    assert(r(0).getLong(3) == 1L)
  }
}
