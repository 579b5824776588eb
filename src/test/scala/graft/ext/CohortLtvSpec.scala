package graft.ext

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Cohort LTV: hand-built curves, scaffolded flat segments, per-user
  * attribution to the acquisition cohort.
  */
class CohortLtvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(d: Int, h: Int = 9) =
    Timestamp.valueOf(f"2024-03-0$d $h%02d:00:00")

  test("curves accumulate per cohort through the corpus horizon") {
    val events = Seq(
      // user 1: cohort day 1 (the signup is the first touch)
      (1L, ts(1, 8), "signup", 0.0),
      (1L, ts(1), "purchase", 10.0), (1L, ts(3), "purchase", 5.0),
      // user 2: same cohort, never buys
      (2L, ts(1), "view", 0.0),
      // user 3: cohort day 2, one purchase that day
      (3L, ts(2), "purchase", 20.0))
      .toDF("user_id", "ts", "event_type", "value")
    val r = Timeseries.cohortLtv(events).collect()
      .map(x => (x.getDate(0).toString, x.getInt(1)) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5)))
      .toMap
    // cohort 2024-03-01 (size 2): rev 10, 0, 5 -> cum 10, 10, 15
    assert(r(("2024-03-01", 0)) == ((2L, 10.0, 10.0, 5.0)))
    assert(r(("2024-03-01", 1)) == ((2L, 0.0, 10.0, 5.0)),
      "flat day appears as a scaffolded segment, not a hole")
    assert(r(("2024-03-01", 2)) == ((2L, 5.0, 15.0, 7.5)))
    // cohort 2024-03-02 (size 1): horizon caps its curve at offset 1
    assert(r(("2024-03-02", 0)) == ((1L, 20.0, 20.0, 20.0)))
    assert(r(("2024-03-02", 1)) == ((1L, 0.0, 20.0, 20.0)))
    assert(r.size == 5)
  }

  test("revenue attributes to the buyer's own cohort only") {
    val events = Seq(
      (1L, ts(1), "signup", 0.0), (2L, ts(2), "signup", 0.0),
      (2L, ts(3), "purchase", 7.0))
      .toDF("user_id", "ts", "event_type", "value")
    val r = Timeseries.cohortLtv(events).collect()
      .map(x => (x.getDate(0).toString, x.getInt(1)) -> x.getDouble(4))
      .toMap
    assert(r(("2024-03-01", 2)) == 0.0, "cohort 1 earned nothing")
    assert(r(("2024-03-02", 1)) == 7.0)
  }
}
