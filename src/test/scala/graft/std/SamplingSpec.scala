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

  test("stratified sample equals the row_number-window reference") {
    // groups of very different sizes, incl. one smaller than n
    val df = (1L to 700L).map { i =>
      val g = if (i <= 400) "big" else if (i <= 690) "mid" else "tiny"
      (g, i, (i % 9 + 1).toDouble)
    }.toDF("g", "id", "w")
    val got = Sampling.stratifiedWeightedSample(df, "g", "id", "w", 25)
    // reference: identical key, per-group row_number cut
    val hv = org.apache.spark.sql.GraftColumns
      .md5Lane(col("id").cast("string"), 0, 7)
    val u = (hv + lit(1L)).cast("double") / lit(72057594037927936.0)
    val keyed = df.withColumn("sample_key",
      round(log(u) / col("w").cast("double"), 9))
    val win = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("sample_key").desc, col("id").asc)
    val ref = keyed.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= 25).select("g", "id", "w", "sample_key")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(rows(got) == rows(ref))
    // the sub-n group surfaces whole
    val byG = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("big" -> 25L, "mid" -> 25L, "tiny" -> 10L))
  }

  test("stratified sample: bounded aggregate, no window, partial agg") {
    val df = spark.range(1L, 2000L).select(col("id"),
      (col("id") % 3).cast("string").as("g"),
      (col("id") % 5 + 1).cast("double").as("w"))
    val frame = Sampling.stratifiedWeightedSample(df, "g", "id", "w", 10)
    frame.collect()
    val windows = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.window.WindowExec => e
    }.length
    val objAggs = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => e
    }.length
    // partial + final ObjectHashAggregate pair; no window anywhere
    assert(windows == 0 && objAggs == 2)
  }

  test("stratified sample ties at the 9-dp key grain break on id") {
    // equal weights + forced equal keys: craft rows whose key collides
    // by giving every row the same weight and checking the id order is
    // what breaks any 9-dp collisions (determinism across reruns)
    val df = (1L to 300L).map(i => ("g", i, 1.0)).toDF("g", "id", "w")
    val a = Sampling.stratifiedWeightedSample(df, "g", "id", "w", 40)
      .collect().map(_.getLong(1)).toSeq
    val b = Sampling.stratifiedWeightedSample(df, "g", "id", "w", 40)
      .collect().map(_.getLong(1)).toSeq
    assert(a == b && a.length == 40)
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
