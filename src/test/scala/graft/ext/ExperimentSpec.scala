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

  test("rank AUC: hand-counted wins/ties, perfect and inverted scores") {
    // pos scores {3,2}, neg {1,2}: wins = 1·1 + 1·2 = 3, ties = 1,
    // AUC = (3 + 0.5)/4 = 0.875
    val mixed = Seq((3L, true), (2L, true), (1L, false), (2L, false))
      .toDF("score", "label")
    val r = Experiment.rankAuc(mixed, "score", "label").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 3L, 1L)))
    assert(r.getLong(4) == 875000000L && r.getDouble(5) == 0.875)
    // perfect separation -> 1.0; inverted -> 0.0; null scores excluded
    val perfect = Seq((5L, true), (6L, true), (1L, false), (2L, false))
      .toDF("score", "label")
    assert(Experiment.rankAuc(perfect, "score", "label")
      .collect()(0).getDouble(5) == 1.0)
    val inverted = Seq((Some(1L), true), (Some(2L), false),
      (None, true), (None, false)).toDF("score", "label")
    val ri = Experiment.rankAuc(inverted, "score", "label").collect()(0)
    assert(ri.getLong(0) == 1L && ri.getLong(1) == 1L &&
      ri.getDouble(5) == 0.0, "nulls drop, inversion scores 0")
  }

  test("KS drift: exact integer gap, argmax value, disjoint supports") {
    // a={1,1,2}, b={2,3}: gaps at v=1/2/3 are 4/3/0 over denominator 6
    val a = Seq(1.0, 1.0, 2.0).toDF("value")
    val b = Seq(2.0, 3.0).toDF("value")
    val r = Experiment.ksDrift(a, b, "value").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 4L)))
    assert(r.getDouble(3) == 1.0, "argmax lands on the widest-gap value")
    assert(r.getLong(4) == 666666666L, "4/6 truncates in e9")
    // identical samples -> 0; fully separated supports -> 1
    val same = Seq(1.0, 2.0).toDF("value")
    assert(Experiment.ksDrift(same, same, "value")
      .collect()(0).getLong(4) == 0L)
    val lo = Seq(1.0, 2.0).toDF("value")
    val hi = Seq(5.0, 6.0).toDF("value")
    assert(Experiment.ksDrift(lo, hi, "value")
      .collect()(0).getDouble(5) == 1.0)
  }

  test("calibration curve: perfectly calibrated step, exact bins") {
    // scores 0..9 twice, label = score >= 5: lo 0, hi 9, bin =
    // s*10 div 10 = s; shares are exactly 0 below the step, 1e9 above
    val rows = for (s <- 0L to 9L; _ <- 1 to 2)
      yield (s, s >= 5L)
    val out = Experiment.calibrationCurve(
        rows.toDF("score", "label"), "score", "label")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(5)))).toMap
    assert(out.size == 10)
    (0 to 9).foreach { b =>
      val (loS, n, share) = out(b)
      assert(loS == b.toLong && n == 2L)
      assert(share == (if (b >= 5) 1000000000L else 0L))
    }
  }

  test("calibration curve: constant score collapses to one full bin") {
    val rows = Seq((7L, true), (7L, false), (7L, true))
    val out = Experiment.calibrationCurve(
        rows.toDF("score", "label"), "score", "label").collect()
    assert(out.length == 1 && out.head.getInt(0) == 0 &&
      out.head.getLong(3) == 3L && out.head.getLong(4) == 2L &&
      out.head.getLong(5) == 666666666L)
  }
}
