package graft.std

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Weighted sampling: determinism, weight bias, rejected weights, and
  * the no-global-sort plan shape.
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("the draw is a pure function of the rows: reruns are identical") {
    val df = (1L to 500L).map(i => (i, (i % 7 + 1).toDouble))
      .toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", 50).collect()
      .map(_.getLong(0)).toSeq
    val b = Sampling.weightedSample(df, "id", "w", 50).collect()
      .map(_.getLong(0)).toSeq
    assert(a == b && a.length == 50)
  }

  test("a dominating weight is effectively always sampled") {
    // ln(u)/w -> 0 as w grows: the 1e6-weight row's key beats ~all
    // unit-weight keys regardless of its uniform draw
    val df = ((1L to 199L).map(i => (i, 1.0)) :+ ((200L, 1e6)))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 10).collect()
      .map(_.getLong(0)).toSet
    assert(got.contains(200L))
  }

  test("null and non-positive weights are excluded, not mis-keyed") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.0), (2L, null), (3L, 0.0), (4L, -1.0), (5L, 5.0))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", 10).collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(1L, 5L))
  }

  test("top-n runs as TakeOrderedAndProject, never a global sort") {
    val df = spark.range(1L, 1000L).select(col("id"),
      (col("id") % 5 + 1).cast("double").as("w"))
    val frame = Sampling.weightedSample(df, "id", "w", 20)
    frame.collect()
    val topK = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => e
    }.length
    val globalSorts = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.SortExec if e.global => e
    }.length
    assert(topK == 1 && globalSorts == 0)
  }
}
