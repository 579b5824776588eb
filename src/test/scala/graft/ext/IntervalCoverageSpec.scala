package graft.ext

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Interval union: overlap merge, touching merge, gaps, hygiene. */
class IntervalCoverageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("overlapping and touching intervals merge; gaps are measured") {
    val iv = Seq(
      // island 1: [0,10) ∪ [5,15) ∪ [15,20) -> [0,20), 20 min covered
      (1L, ts(0), ts(10), 1L), (1L, ts(5), ts(15), 2L),
      (1L, ts(15), ts(20), 3L),
      // 10-minute gap, island 2: [30,35)
      (1L, ts(30), ts(35), 4L),
      // key 2: one interval
      (2L, ts(0), ts(5), 5L))
      .toDF("k", "s", "e", "id")
    val r = Timeseries.intervalCoverage(iv, "k", "s", "e", "id")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5))).toMap
    assert(r(1L) == ((4L, 2L, 1500L, 2100L, 600L)),
      "covered 25 min across 2 islands, span 35 min, gap 10 min")
    assert(r(2L) == ((1L, 1L, 300L, 300L, 0L)))
  }

  test("contained intervals never reopen an island") {
    // [0,30) contains [5,10) and [20,25): all one island
    val iv = Seq((1L, ts(0), ts(30), 1L), (1L, ts(5), ts(10), 2L),
      (1L, ts(20), ts(25), 3L)).toDF("k", "s", "e", "id")
    val r = Timeseries.intervalCoverage(iv, "k", "s", "e", "id")
      .collect()(0)
    assert(r.getLong(2) == 1L && r.getLong(3) == 1800L)
    assert(r.getLong(5) == 0L)
  }

  test("null bounds and inverted intervals are excluded from coverage " +
      "but COUNTED per key; null keys stay out entirely") {
    val iv = Seq(
      (Some(1L), Some(ts(0)), Some(ts(5)), 1L),
      (Option.empty[Long], Some(ts(0)), Some(ts(5)), 2L),
      (Some(1L), Some(ts(10)), Option.empty[Timestamp], 3L),
      (Some(1L), Some(ts(10)), Some(ts(5)), 4L))
      .toDF("k", "s", "e", "id")
    val r = Timeseries.intervalCoverage(iv, "k", "s", "e", "id")
      .collect()
    assert(r.length == 1 && r(0).getLong(1) == 1L)
    assert(r(0).getLong(r(0).fieldIndex("n_malformed")) == 2L,
      "the null-end and inverted rows are visible, not silently dropped")
  }

  test("a key whose every interval is malformed still reports") {
    val iv = Seq(
      (1L, ts(5), ts(0), 1L),  // inverted
      (2L, ts(0), ts(5), 2L))  // healthy
      .toDF("k", "s", "e", "id")
    val r = Timeseries.intervalCoverage(iv, "k", "s", "e", "id")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.contains(1L), "all-malformed key must not vanish")
    assert(r(1L).getLong(1) == 0L && r(1L).getLong(2) == 0L &&
      r(1L).getLong(3) == 0L &&
      r(1L).getLong(r(1L).fieldIndex("n_malformed")) == 1L)
    assert(r(2L).getLong(1) == 1L &&
      r(2L).getLong(r(2L).fieldIndex("n_malformed")) == 0L)
  }
}
