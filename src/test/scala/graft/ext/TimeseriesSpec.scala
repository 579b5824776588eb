package graft.ext

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions.{col, lit, when}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Trailing-window anomaly detection on a hand-built series. */
class TimeseriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = Instant.parse("2024-01-01T00:00:00Z")
  private def at(hour: Int, minute: Int): Timestamp =
    Timestamp.from(t0.plusSeconds(hour * 3600L + minute * 60L))

  test("a spike after 24 flat hours is flagged; flat hours are not") {
    // hours 0..23: exactly 2 events each; hour 24: 12 events (spike);
    // hour 25: 2 events again (history now contains the spike)
    val rows = (for (h <- 0 until 24; i <- 0 until 2)
      yield ("click", at(h, i))) ++
      (0 until 12).map(i => ("click", at(24, i))) ++
      (0 until 2).map(i => ("click", at(25, i)))
    val events = rows.toDF("event_type", "ts")
    val out = Timeseries.hourlyAnomalies(events).collect()
      .map(r => r.getTimestamp(1) -> r).toMap
    // only hours 24 and 25 have a full 24-hour history
    assert(out.size == 2)
    val spike = out(at(24, 0))
    assert(spike.getLong(2) == 12)
    assert(spike.getDouble(3) == 2.0)          // trailing mean of flat 2s
    // flat history has zero variance -> z is null, verdict still false…
    assert(spike.isNullAt(4) && !spike.getBoolean(5))
    // …so ALSO prove a nonzero-variance spike flags: perturb one hour
    val events2 = events.union(
      Seq(("click", at(5, 30))).toDF("event_type", "ts"))
    val out2 = Timeseries.hourlyAnomalies(events2).collect()
      .map(r => r.getTimestamp(1) -> r).toMap
    val spike2 = out2(at(24, 0))
    assert(!spike2.isNullAt(4) && spike2.getDouble(4) > 3)
    assert(spike2.getBoolean(5))
    // the calm hour after the spike is not flagged
    assert(!out2(at(25, 0)).getBoolean(5))
  }

  test("transition matrix: hand-built chains, row-normalized, ordered") {
    def ts(s: Int) = Timestamp.from(Instant.parse(
      f"2024-01-01T00:00:$s%02dZ"))
    // user 1: a -> b -> a -> c; user 2: a -> b; user 3 lone event
    // (no successor), plus a null user and a null ts to drop
    val events = Seq(
      (Some(1L), Some(ts(0)), "a", 1L), (Some(1L), Some(ts(1)), "b", 2L),
      (Some(1L), Some(ts(2)), "a", 3L), (Some(1L), Some(ts(3)), "c", 4L),
      (Some(2L), Some(ts(0)), "a", 5L), (Some(2L), Some(ts(1)), "b", 6L),
      (Some(3L), Some(ts(0)), "z", 7L),
      (Option.empty[Long], Some(ts(0)), "a", 8L),
      (Some(4L), Option.empty[Timestamp], "a", 9L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val m = Timeseries.transitionMatrix(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // a -> b twice, a -> c once (row a sums to 1); b -> a once
    assert(m(("a", "b")) == ((2L, 0.666667)))
    assert(m(("a", "c")) == ((1L, 0.333333)))
    assert(m(("b", "a")) == ((1L, 1.0)))
    assert(!m.keySet.exists(_._1 == "z"), "lone events emit no row")
    assert(m.size == 3)
    // ties on ts break by event_id: two same-instant events order 10,11
    val tied = Seq(
      (1L, ts(0), "x", 10L), (1L, ts(0), "y", 11L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val tm = Timeseries.transitionMatrix(tied).collect()
    assert(tm.length == 1 && tm(0).getString(0) == "x" &&
      tm(0).getString(1) == "y")
  }

  test("sequence likelihood: rare transitions sink, hand-traced avgs") {
    def ts(s: Int) = Timestamp.from(Instant.parse(
      f"2024-01-01T00:00:$s%02dZ"))
    // pairs: u1 (a,b)(b,a)(a,b), u2 (a,b), u3 (a,c) → matrix
    // P(b|a)=3/4, P(a|b)=1, P(c|a)=1/4. Averages (9-dp ln, 6-dp avg):
    // u3 = ln(.25) = -1.386294, u2 = ln(.75) = -0.287682,
    // u1 = 2·ln(.75)/3 = -0.191788 — ascending = rare-path user first.
    val events = Seq(
      (1L, ts(0), "a", 1L), (1L, ts(1), "b", 2L),
      (1L, ts(2), "a", 3L), (1L, ts(3), "b", 4L),
      (2L, ts(0), "a", 5L), (2L, ts(1), "b", 6L),
      (3L, ts(0), "a", 7L), (3L, ts(1), "c", 8L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val r = Timeseries.sequenceLikelihood(events, k = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    graft.std.Materialize.releaseAll()
    assert(r.toSeq == Seq((3L, 1L, -1.386294), (2L, 1L, -0.287682),
      (1L, 3L, -0.191788)), s"got ${r.toSeq}")
  }

  test("retention cohorts: hand-built matrix, same-day events collapse") {
    // u1: days 0,1,2; u2: days 0,2 (two events on day 0); u3: day 1 only
    val events = Seq(
      (1L, at(1, 0)), (1L, at(25, 0)), (1L, at(49, 0)),
      (2L, at(2, 0)), (2L, at(2, 30)), (2L, at(50, 0)),
      (3L, at(26, 0))).toDF("user_id", "ts")
    val out = Timeseries.retentionCohorts(events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> ((2L, 2L, 1.0)),
      ("2024-01-01", 1L) -> ((1L, 2L, 0.5)),
      ("2024-01-01", 2L) -> ((2L, 2L, 1.0)),
      ("2024-01-02", 0L) -> ((1L, 1L, 1.0))))
  }

  test("partial history rows are suppressed, per key") {
    val events = ((0 until 30).map(h => ("a", at(h, 0))) :+
      (("b", at(0, 0)))).toDF("event_type", "ts")
    val out = Timeseries.hourlyAnomalies(events).collect()
    // key a: 30 hours -> 6 full-history rows; key b: 1 hour -> none
    assert(out.count(_.getString(0) == "a") == 6)
    assert(!out.exists(_.getString(0) == "b"))
  }

  test("null timestamps drop, null keys monitor as the empty series") {
    val base = (0 until 26).map(h => ("a", at(h, 0)))
    val dirty = base ++ Seq(
      ("a", null.asInstanceOf[Timestamp]),          // no hour: dropped
      (null.asInstanceOf[String], at(27, 0)))       // "" series, alone
    val out = Timeseries.hourlyAnomalies(dirty.toDF("event_type", "ts"))
      .collect()
    assert(out.map(_.getString(0)).toSet == Set("a")) // "" lacks history
    assert(out.length ==
      Timeseries.hourlyAnomalies(base.toDF("event_type", "ts"))
        .collect().length)
    // the streaming form survives the same rows (batch-mode execution)
    val streamed = graft.streaming.StreamingOps
      .anomalyStream(dirty.toDF("event_type", "ts")).collect()
    assert(streamed.forall(_.key == "a"))
  }

  test("cadence profile: timer bot flags, human jitter doesn't, " +
    "even-count medians are exact") {
    def ev(id: Long, user: Long, sec: Long): (Long, Timestamp, Long) =
      (id, Timestamp.from(t0.plusSeconds(sec)), user)
    // user 1: perfect 10s timer, 6 events -> median 10000, MAD 0, bot.
    // user 2: 5 wildly uneven gaps (1,2,100,3,200) -> median 3000,
    //   MAD 2000 (sorted devs 0,1000,2000,97000,197000), not regular.
    // user 3: gaps (5,7) -> EVEN medians: (5+7)*1000/2 = 6000, MAD
    //   (1000+1000)/2 = 1000; only 2 gaps -> below minGaps, no flag.
    // user 4: one event -> no gaps -> absent.
    val rows =
      (0 to 5).map(i => ev(10 + i, 1L, i * 10L)) ++
        Seq(0L, 1L, 3L, 103L, 106L, 306L).zipWithIndex.map {
          case (s, i) => ev(20 + i, 2L, s) } ++
        Seq(ev(30, 3L, 0), ev(31, 3L, 5), ev(32, 3L, 12)) ++
        Seq(ev(40, 4L, 77))
    val events = rows.toDF("event_id", "ts", "user_id")
    val r = Timeseries.cadenceProfile(events)
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getBoolean(5)))).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r(1L) == ((6L, 5L, 10000L, 0L, true)))
    assert(r(2L) == ((6L, 5L, 3000L, 2000L, false)))
    assert(r(3L) == ((3L, 2L, 6000L, 1000L, false)))
  }

  test("kaplan-meier: textbook curve with same-time censoring") {
    // durations: death@1, death@2 + censor@2, censor@3, death@4 (N=5)
    //   t=1: n=5, d=1 -> f=0.8,          S=0.8
    //   t=2: n=4 (censor@2 still at risk), d=1 -> f=0.75, S=0.6
    //   t=4: n=1, d=1 -> f=0.0,          S=0.0  (zero propagates)
    // censor times never emit rows; same-time censors are counted.
    val subjects = Seq((1L, 1), (2L, 1), (2L, 0), (3L, 0), (4L, 1))
      .toDF("duration_s", "observed")
    val r = Timeseries.kmSurvival(subjects).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    assert(r.keySet == Set(1L, 2L, 4L))
    assert(r(1L) == ((5L, 1L, 0L, 800000000L, 0.8)))
    assert(r(2L) == ((4L, 1L, 1L, 600000000L, 0.6)))
    assert(r(4L) == ((1L, 1L, 0L, 0L, 0.0)))
  }

  test("kaplan-meier: no censoring tracks the empirical survivor " +
    "to within fixed-point truncation") {
    // deaths at 1,2,3,4, no censoring: S = 3/4, 1/2, 1/4, 0. The
    // truncating fold only ever SHAVES: 2/3 -> 666666666, so S(2) is
    // 0.499999999 — one unit under the rational value, never over.
    val subjects = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1))
      .toDF("duration_s", "observed")
    val r = Timeseries.kmSurvival(subjects).collect()
      .map(x => x.getLong(0) -> x.getLong(4)).toMap
    assert(r == Map(1L -> 750000000L, 2L -> 499999999L,
      3L -> 249999999L, 4L -> 0L))
  }

  test("cadence profile: zero-gap burst is maximally regular") {
    // six events in the same second: every gap 0 -> median 0, MAD 0,
    // 0 <= 0 flags — the burst bot the scaladoc promises to catch
    val rows = (0 to 5).map(i =>
      (i.toLong, Timestamp.from(t0), 9L))
    val r = Timeseries.cadenceProfile(
        rows.toDF("event_id", "ts", "user_id"))
      .collect()
    assert(r.length == 1)
    assert(r.head.getLong(3) == 0L && r.head.getLong(4) == 0L &&
      r.head.getBoolean(5))
  }

  private def ewmaOf(rows: Seq[(String, Timestamp, Double)]) =
    Timeseries.ewmaBaseline(
      rows.toDF("event_type", "ts", "value"))

  test("ewma baseline: constant series tracks exactly, no verdicts") {
    // 10/day for 5 days: EWMA stays 10_000_000 micro at every step
    // ((3*x + 7*x) div 10 = x), residual 0 after day 1, no flags
    val rows = (0 until 5).map(d =>
      ("click", Timestamp.from(t0.plusSeconds(d * 86400L)), 10.0))
    val out = ewmaOf(rows).orderBy("day").collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(4) == 10000000L)) // ewma_micro
    assert(out.head.isNullAt(6)) // first day: no forecast
    assert(out.tail.forall(_.getLong(6) == 0L)) // residual_micro
    assert(out.forall(r => !r.getBoolean(7) && !r.getBoolean(8)))
  }

  test("ewma baseline: hand-computed fold, spike and dip verdicts") {
    // days: 10, 10, 100 (spike), 1 (dip), 1
    //   ewma(micro): 10M; (3*10M+7*10M)/10=10M; (300M+70M)/10=37M;
    //   (3M+259M)/10=26.2M; (3M+183.4M)/10=18.64M
    val vals = Seq(10.0, 10.0, 100.0, 1.0, 1.0)
    val rows = vals.zipWithIndex.map { case (v, d) =>
      ("click", Timestamp.from(t0.plusSeconds(d * 86400L)), v) }
    val out = ewmaOf(rows).orderBy("day").collect()
    assert(out.map(_.getLong(4)).toSeq == Seq(10000000L, 10000000L,
      37000000L, 26200000L, 18640000L))
    // day 2: 100M > 2*10M -> spike; day 3: 1M*2 < 37M -> dip
    assert(out.map(_.getBoolean(7)).toSeq ==
      Seq(false, false, true, false, false))
    assert(out.map(_.getBoolean(8)).toSeq ==
      Seq(false, false, false, true, true))
    // one-step-ahead residual on the spike day: 100M - 10M
    assert(out(2).getLong(6) == 90000000L)
  }

  test("ewma baseline: series are independent; truncation shaves") {
    // interleaved second series must not leak into the first; a
    // 3-then-4 series folds (3*4M + 7*3M) div 10 = 3_300_000 exactly,
    // and 1-then-2 folds (6M + 7M) div 10 = 1_300_000
    val rows = Seq(
      ("a", Timestamp.from(t0), 3.0),
      ("b", Timestamp.from(t0), 1.0),
      ("a", Timestamp.from(t0.plusSeconds(86400L)), 4.0),
      ("b", Timestamp.from(t0.plusSeconds(86400L)), 2.0))
    val out = ewmaOf(rows).orderBy("series", "day").collect()
    assert(out.map(_.getLong(4)).toSeq ==
      Seq(3000000L, 3300000L, 1000000L, 1300000L))
  }

  test("ewma baseline: within-day values sum before the fold") {
    // two events on day 0 (2.5 + 7.5 = 10), one on day 1 (20):
    // seed 10M, then (3*20M + 7*10M) div 10 = 13M; n_events 2 then 1
    val rows = Seq(
      ("a", Timestamp.from(t0), 2.5),
      ("a", Timestamp.from(t0.plusSeconds(60L)), 7.5),
      ("a", Timestamp.from(t0.plusSeconds(86400L)), 20.0))
    val out = ewmaOf(rows).orderBy("day").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L))
    assert(out.map(_.getLong(4)).toSeq == Seq(10000000L, 13000000L))
  }

  test("ewma baseline: negative daily sum fails loudly; a negative " +
    "value inside a non-negative day does not") {
    // day 0 sums to -2.0: the truncating-vs-flooring split the
    // positivity contract exists for -> the job must FAIL, not fold
    val bad = Seq(
      ("a", Timestamp.from(t0), 3.0),
      ("a", Timestamp.from(t0.plusSeconds(60L)), -5.0))
    val e = intercept[Exception] { ewmaOf(bad).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++
        msgs(t.getCause)
    assert(msgs(e).exists(_.contains("positivity")))
    // but negatives that SUM non-negative per day are fine (the
    // contract is on the fold's operands, not the raw events)
    val ok = Seq(
      ("a", Timestamp.from(t0), 3.0),
      ("a", Timestamp.from(t0.plusSeconds(60L)), -3.0),
      ("a", Timestamp.from(t0.plusSeconds(86400L)), 10.0))
    val out = ewmaOf(ok).orderBy("day").collect()
    // day 0 sums to 0, day 1 folds (3*10M + 7*0) div 10 = 3M
    assert(out.map(_.getLong(4)).toSeq == Seq(0L, 3000000L))
  }

  private def holtOf(rows: Seq[(String, Timestamp, Double)]) =
    Timeseries.holtTrend(rows.toDF("event_type", "ts", "value"))

  test("holt trend: a perfect ramp is absorbed into the trend state " +
    "where EWMA lags it forever") {
    // 10, 20, 30, ... : hand fold (micro units, floor div)
    //   d0: l=10M b=0
    //   d1: l=(60M+70M)/10=13M   b=(2*3M+0)/10=600k
    //   d2: l=(90M+7*13.6M)/10=18.52M b=(2*5.52M+4.8M)/10=1.584M
    //   d3: l=(120M+7*20.104M)/10=26.0728M
    //       b=(2*7.5528M+8*1.584M)/10=2.77776M
    val rows = (0 until 4).map(d =>
      ("click", Timestamp.from(t0.plusSeconds(d * 86400L)),
        (d + 1) * 10.0))
    val out = holtOf(rows).orderBy("day").collect()
    assert(out.map(_.getLong(4)).toSeq ==
      Seq(10000000L, 13000000L, 18520000L, 26072800L), "levels")
    assert(out.map(_.getLong(5)).toSeq ==
      Seq(0L, 600000L, 1584000L, 2777760L), "trends")
    // forecast = prior level + prior trend; first day has none
    assert(out.head.isNullAt(6))
    assert(out(2).getLong(6) == 13600000L)
    assert(out(2).getLong(7) == 30000000L - 13600000L)
    // the trend state grows toward the true slope (10/day) while the
    // x53 EWMA of the same ramp under-forecasts every single day
    val ewma = ewmaOf(rows).orderBy("day").collect()
    assert(ewma.tail.forall(_.getLong(6) > 0L),
      "EWMA lags a ramp: every residual positive")
  }

  test("holt trend: constant series pins trend 0, forecast exact") {
    val rows = (0 until 5).map(d =>
      ("click", Timestamp.from(t0.plusSeconds(d * 86400L)), 10.0))
    val out = holtOf(rows).orderBy("day").collect()
    assert(out.forall(_.getLong(4) == 10000000L))
    assert(out.forall(_.getLong(5) == 0L))
    assert(out.tail.forall(_.getLong(7) == 0L), "residual 0")
  }

  test("holt trend: a falling series drives the trend NEGATIVE and " +
    "the floor division still matches a driver-side replay") {
    val vals = Seq(300.0, 250.0, 200.0, 150.0, 100.0, 50.0, 130.0, 5.0)
    val rows = vals.zipWithIndex.map { case (v, d) =>
      ("a", Timestamp.from(t0.plusSeconds(d * 86400L)), v) }
    val out = holtOf(rows).orderBy("day").collect()
    def replay(xs: Seq[Long]): Seq[(Long, Long)] = {
      var l = xs.head; var b = 0L
      (l, b) +: xs.tail.map { x =>
        val lp = Math.floorDiv(3 * x + 7 * (l + b), 10L)
        b = Math.floorDiv(2 * (lp - l) + 8 * b, 10L)
        l = lp
        (l, b)
      }
    }
    val exp = replay(vals.map(v => (v * 1e6).toLong))
    assert(out.map(x => (x.getLong(4), x.getLong(5))).toSeq == exp,
      s"got ${out.map(x => (x.getLong(4), x.getLong(5))).toSeq} " +
        s"expected $exp")
    assert(exp.exists(_._2 < 0L),
      "fixture must exercise a negative trend state")
  }

  test("holt trend: the 4e16 magnitude bound fails loudly") {
    val rows = Seq(
      ("a", Timestamp.from(t0), 5.0e10),
      ("a", Timestamp.from(t0.plusSeconds(86400L)), 1.0))
    val e = intercept[Exception] { holtOf(rows).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++
        msgs(t.getCause)
    assert(msgs(e).exists(_.contains("fixed-point bound")))
  }

  test("autocorrelation: exact weekly pattern reads lag-7 r = 1; " +
    "calendar gaps drop pairs; constants read NULL") {
    val week = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0)
    val rows = (0 until 14).map(d =>
      ("a", Timestamp.from(t0.plusSeconds(d * 86400L)),
        week(d % 7))) ++
      // series b: days 0, 1, 3 — day 3 has no day-2 predecessor, so
      // lag 1 keeps exactly ONE pair (and one pair has zero variance)
      Seq(0, 1, 3).map(d =>
        ("b", Timestamp.from(t0.plusSeconds(d * 86400L)), d * 1.0)) ++
      // series c: constant -> zero variance at every lag
      (0 until 9).map(d =>
        ("c", Timestamp.from(t0.plusSeconds(d * 86400L)), 2.0))
    val out = Timeseries.autocorrelation(
        rows.toDF("event_type", "ts", "value"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val a7 = out(("a", 7L))
    assert(a7.getLong(2) == 7L && a7.getDouble(3) == 1.0,
      "a 7-periodic series must read lag-7 autocorrelation exactly 1")
    val a1 = out(("a", 1L))
    assert(a1.getLong(2) == 13L && a1.getDouble(3) < 1.0)
    val b1 = out(("b", 1L))
    assert(b1.getLong(2) == 1L && b1.isNullAt(3),
      "calendar lag keeps only true adjacent-day pairs")
    assert(out(("c", 1L)).isNullAt(3) && out(("c", 7L)).isNullAt(3),
      "zero variance must read NULL, never NaN or +-inf")
  }

  private def mixEvents(rows: Seq[(String, String, Int, String)]) = {
    val base = Instant.parse("2024-01-01T00:00:00Z")
    rows.map { case (u, t, s, id) =>
      (u, t, Timestamp.from(base.plusSeconds(s.toLong)), id)
    }.toDF("user_id", "event_type", "ts", "event_id")
  }

  test("stationary mix: deterministic 2-cycle holds the uniform seed; " +
    "null hygiene") {
    // a <-> b forever: P = [[0,1],[1,0]]; the uniform (5e8, 5e8) seed
    // is the fixed point, every division exact, so 8 rounds change
    // nothing and mass stays a full 1e9
    val events = mixEvents(Seq(
      ("u1", "a", 0, "e0"), ("u1", "b", 1, "e1"), ("u1", "a", 2, "e2"),
      ("u1", "b", 3, "e3"), ("u1", "a", 4, "e4"),
      // poison rows: null event_id / null ts must drop BEFORE the
      // lead window (else "c" would enter the chain as a state)
      ("u1", "c", 5, null), ("u2", "c", 0, "e9")))
      .withColumn("ts", when(col("event_id") === "e9",
        lit(null).cast("timestamp")).otherwise(col("ts")))
    val out = Timeseries.stationaryMix(events).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b"))
    assert(out("a").getLong(1) == 500000000L)
    assert(out("b").getLong(1) == 500000000L)
    assert(out("a").getLong(3) == 1000000000L)
    assert(out("a").getDouble(2) == 0.5)
  }

  test("stationary mix: absorbing destination drops mass, " +
    "reported via mass_e9") {
    // transitions a->a, a->b, a->c: b and c have NO outgoing edges,
    // so the state set is {a} alone and 2/3 of a's mass leaks out
    // each round: pi = 1e9 with 8 rounds of `* 1 div 3` truncation
    val events = mixEvents(Seq(
      ("u1", "a", 0, "e0"), ("u1", "a", 1, "e1"), ("u1", "b", 2, "e2"),
      ("u2", "a", 0, "e3"), ("u2", "c", 1, "e4")))
    val out = Timeseries.stationaryMix(events).collect()
    assert(out.length == 1 && out(0).getString(0) == "a")
    // 1e9 div 3, eight times: the exact truncating cascade
    val expected = (1 to 8).foldLeft(1000000000L)((m, _) => m / 3)
    assert(out(0).getLong(1) == expected)
    assert(out(0).getLong(3) == expected)
    assert(expected < 1000000000L)
  }

  test("stationary mix: differential vs a driver-side power-iteration " +
    "replay on seeded random chains") {
    // random per-user event chains (with ts ties broken by event_id),
    // replayed in plain Scala: pair counts under the same total
    // order, 8 rounds of per-term truncating-div updates, dropped
    // mass and all
    val rnd = new scala.util.Random(1234L)
    val types = Vector("a", "b", "c", "d", "e")
    val rows = (0 until 300).map { i =>
      (s"u${rnd.nextInt(12)}", types(rnd.nextInt(5)),
        rnd.nextInt(40), f"e$i%03d")
    }
    // ---- reference replay ----
    val pairs = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._3, e._4)).map(_._2)
      ordered.zip(ordered.drop(1))
    }
    val n12 = pairs.groupBy(identity).map { case (p, l) =>
      p -> l.size.toLong }
    val n1 = pairs.groupBy(_._1).map { case (t, l) => t -> l.size.toLong }
    val states = n1.keySet
    var pi = states.map(_ -> 1000000000L / states.size).toMap
    for (_ <- 1 to 8) {
      val contrib = n12.toSeq.collect {
        case ((p, nx), c) if states.contains(nx) =>
          nx -> (pi(p) * c / n1(p))
      }
      pi = states.map(s => s ->
        contrib.filter(_._1 == s).map(_._2).sum).toMap
    }
    // ---- the operator ----
    val got = Timeseries.stationaryMix(mixEvents(rows)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == pi,
      s"differential mismatch:\n got      $got\n expected $pi")
  }

  test("stationary mix: asymmetric chain converges toward 1/3-2/3, " +
    "hand-traced fixed point") {
    // P(a->b)=1, P(b->a)=P(b->b)=1/2 -> stationary (1/3, 2/3); all
    // eight rounds divide exactly so mass stays 1e9, and the 8th
    // iterate is the hand-traced (333_984_375, 666_015_625)
    val events = mixEvents(Seq(
      ("u1", "a", 0, "e0"), ("u1", "b", 1, "e1"), ("u1", "b", 2, "e2"),
      ("u1", "a", 3, "e3"), ("u1", "b", 4, "e4"), ("u1", "b", 5, "e5"),
      ("u1", "a", 6, "e6")))
    val out = Timeseries.stationaryMix(events).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 333984375L)
    assert(out("b").getLong(1) == 666015625L)
    assert(out("a").getLong(3) == 1000000000L)
    assert(math.abs(out("a").getDouble(2) - 1.0 / 3) < 1e-2)
    assert(math.abs(out("b").getDouble(2) - 2.0 / 3) < 1e-2)
  }
}
