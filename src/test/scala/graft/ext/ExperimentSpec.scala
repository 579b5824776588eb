package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** A/B readout: hand-computed z, degenerate pooled rates, hygiene. */
class ExperimentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-computed two-proportion z on a 2x2 design") {
    // arm 0 = even users {2,4}, arm 1 = odd {1,3}
    // purchases: 2, 1, 3  ->  p_control=1/2, p_treatment=2/2
    val events = Seq(
      (2L, "purchase"), (4L, "view"), (1L, "purchase"), (3L, "purchase"))
      .toDF("user_id", "event_type")
    val r = Experiment.abTest(events, "user_id", "event_type",
        Seq("purchase"), u => (u % 2).cast("int"))
      .collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 0L, "a wired parity split assigns everyone")
    assert(r.getLong(4) == 1L && r.getLong(5) == 2L)
    assert(r.getDouble(6) == 0.5 && r.getDouble(7) == 1.0)
    assert(r.getDouble(8) == 0.5)
    // z = 0.5 / sqrt(0.75*0.25*(1/2+1/2)) = 1.154701 at 6 dp
    assert(r.getDouble(9) == 1.154701, s"z ${r.getDouble(9)}")
  }

  test("degenerate pooled rates (0 or 1) produce null z, not NaN") {
    val all = Seq((1L, "purchase"), (2L, "purchase"))
      .toDF("user_id", "event_type")
    val r = Experiment.abTest(all, "user_id", "event_type",
      Seq("purchase", "click"), u => (u % 2).cast("int")).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("purchase").isNullAt(9), "pooled=1 has no z")
    assert(r("click").isNullAt(9), "pooled=0 has no z")
    assert(r("click").getDouble(6) == 0.0)
  }

  test("null user ids are dropped; conversion is per-user, not per-event") {
    val events = Seq(
      (Some(2L), "purchase"), (Some(2L), "purchase"),  // one user, twice
      (Option.empty[Long], "purchase"), (Some(1L), "view"))
      .toDF("user_id", "event_type")
    val r = Experiment.abTest(events, "user_id", "event_type",
      Seq("purchase"), u => (u % 2).cast("int")).collect()(0)
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getLong(4) == 1L, "duplicate events must not double-count")
    assert(r.getLong(5) == 0L)
  }

  test("a miswired arm function surfaces as n_unassigned, not shrinkage") {
    // 1-based arms (1/2) — the classic wiring bug: arm 2 users must
    // show up in n_unassigned instead of silently vanishing
    val events = Seq((1L, "purchase"), (2L, "purchase"), (4L, "view"))
      .toDF("user_id", "event_type")
    val r = Experiment.abTest(events, "user_id", "event_type",
      Seq("purchase"), u => (u % 2 + 1).cast("int")).collect()(0)
    assert(r.getLong(1) == 0L, "nobody maps to arm 0")
    assert(r.getLong(2) == 2L, "even users 2 and 4 land in arm 1")
    assert(r.getLong(3) == 1L, "odd user 1 maps to arm 2 -> unassigned")
    // null arms count as unassigned too
    val rNull = Experiment.abTest(events, "user_id", "event_type",
      Seq("purchase"),
      _ => org.apache.spark.sql.functions.lit(null).cast("int"))
      .collect()(0)
    assert(rNull.getLong(1) == 0L && rNull.getLong(2) == 0L &&
      rNull.getLong(3) == 3L)
  }
}
