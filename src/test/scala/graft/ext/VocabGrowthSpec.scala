package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Vocabulary growth: first-occurrence attribution, bucketing, the
  * cumulative curve.
  */
class VocabGrowthSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("types attribute to their first bucket; the curve accumulates") {
    val docs = Seq(
      (0L, "a b"), (1L, "a c"), (2L, "b d"), (3L, "e"), (5L, "f a"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.vocabGrowth(docs, bucketDocs = 2)
      .collect().sortBy(_.getLong(0))
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    assert(r.toSeq == Seq(
      (0L, 0L, 3L, 3L),  // a, b, c first seen in docs 0-1
      (1L, 2L, 2L, 5L),  // d, e
      (2L, 4L, 1L, 6L))) // f; the repeated a never recounts
  }
}
