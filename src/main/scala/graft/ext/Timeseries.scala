package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series monitoring over event streams: trailing-window z-score
  * anomaly detection — the "did this metric just spike?" report a BI
  * deployment runs on its operational counters.
  */
object Timeseries {

  /** Per-(key, hour) event counts z-scored against the TRAILING
    * `trailing` observed hours (rows-frame: the previous `trailing`
    * hours that had events, which for a dense stream is the previous
    * `trailing` wall-clock hours). Rows only where the full history
    * exists; `is_anomaly` flags |z| >= `zThreshold`.
    *
    * 100 TB shape: the corpus collapses to |keys| × |hours| count rows
    * via partial aggregation BEFORE the window — the window itself
    * runs over the tiny counter frame, so partition-by-key skew is
    * skew over counters, never over events.
    *
    * Determinism: counts are exact longs, the window sums (`Σn`,
    * `Σn²`) are exact longs, and every double derives from those
    * integers by the same expression tree both engines evaluate —
    * mean/z round to 6 dp, the anomaly verdict compares the ROUNDED z
    * so the boolean matches the printed score.
    */
  /** Retention cohort matrix: users grouped by first-activity day, the
    * count (and fraction) of each cohort still active at each day
    * offset. The classic product-analytics report.
    *
    * 100 TB shape: the event corpus collapses FIRST to distinct
    * (user, day) pairs — partial aggregation absorbs the per-user
    * event volume before any join — then to per-user cohort minima,
    * and the (cohort, offset) matrix is |days|² rows at most. The
    * cohort-size join is a broadcast against that tiny matrix. The
    * only corpus-sized shuffles carry (user_id, day) pairs, nothing
    * wider.
    *
    * Determinism: pure integer counts; `retention` is the rounded
    * ratio of two exact longs.
    */
  def retentionCohorts(events: DataFrame, tsCol: String = "ts",
                       userCol: String = "user_id"): DataFrame = {
    val days = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
      .distinct()
    val cohorts = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    val counts = days.join(cohorts, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long")
          .as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active")) // (user, day) pairs are distinct
    val sizes = counts.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_active").as("cohort_size"))
    counts.join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
  }

  /** Cohort LTV curves (x42): cumulative purchase revenue per user by
    * acquisition cohort and day offset — the monetary sibling of
    * [[retentionCohorts]] (retention says WHO came back; LTV says what
    * they were worth), and the payback-period input every acquisition
    * budget is set against.
    *
    * 100 TB shape: the corpus collapses to per-user first days and to
    * (cohort, offset) revenue cells via partial aggregation; the
    * scaffold (every cohort × every offset through the corpus horizon,
    * so flat-revenue days appear as flat curve segments instead of
    * holes) and the running sum live on the |days|²-bounded matrix —
    * the cumulative window is per-cohort over that tiny frame, never
    * over events.
    *
    * Determinism: revenue sums ride DECIMAL(18,6) (order-free); the
    * cumulative window sums the same decimals over scaffold-distinct
    * offsets; ltv divides two exact quantities and rounds once.
    *
    * Returns (cohort_day, day_offset, cohort_size, revenue,
    * cum_revenue, ltv).
    */
  def cohortLtv(events: DataFrame, tsCol: String = "ts",
                userCol: String = "user_id",
                valueCol: String = "value",
                purchaseType: String = "purchase",
                typeCol: String = "event_type"): DataFrame = {
    val firstDay = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("user_id"))
      .agg(to_date(min(col(tsCol))).as("cohort_day"))
    val sizes = firstDay.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    val horizon = events.agg(to_date(max(col(tsCol))).as("_maxd"))
    val rev = events
      .filter(col(typeCol) === purchaseType && col(userCol).isNotNull)
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("_d"),
        col(valueCol).cast("decimal(18,6)").as("_v"))
      .join(firstDay, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("_d"), col("cohort_day")).as("day_offset"))
      .agg(sum(col("_v")).as("_rev"))
    val scaffold = sizes.crossJoin(broadcast(horizon))
      .select(col("cohort_day"), col("cohort_size"),
        explode(sequence(lit(0),
          datediff(col("_maxd"), col("cohort_day")))).as("day_offset"))
    val cum = Window.partitionBy(col("cohort_day"))
      .orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, 0)
    scaffold.join(rev, Seq("cohort_day", "day_offset"), "left_outer")
      .withColumn("_rv",
        coalesce(col("_rev"), lit(0).cast("decimal(18,6)")))
      .withColumn("_cum", sum(col("_rv")).over(cum))
      .select(col("cohort_day"), col("day_offset"), col("cohort_size"),
        round(col("_rv").cast("double"), 6).as("revenue"),
        round(col("_cum").cast("double"), 6).as("cum_revenue"),
        round(col("_cum").cast("double") / col("cohort_size"), 6)
          .as("ltv"))
  }

  /** Floor-clamped running balance (x43): per-key stock-on-hand where
    * the balance can never go below zero — `b_t = max(0, b_{t-1} +
    * d_t)`, the inventory/wallet semantics a plain running sum cannot
    * express because the clamp makes the recurrence NON-associative.
    *
    * The trick that keeps it one window pass instead of a sequential
    * scan: the reflection closed form `b_t = S_t − min(0, min_{k≤t}
    * S_k)` (prefix sums reflected at the floor — the running minimum
    * absorbs exactly the mass the clamp would have discarded). The
    * oracle runs the LITERAL sequential recursion in a recursive CTE,
    * so the gate proves the closed form, not just reproduces it.
    *
    * 100 TB shape: one shuffle on the key; both windows (running sum,
    * then running min OF that sum) share the partitioning, so the
    * second pass adds no exchange. A single key whose history exceeds
    * a task decomposes by the [[graft.std.PrefixSum]] two-level
    * device — sums and minima are both associative prefixes.
    *
    * Determinism: deltas are exact integer-valued doubles in this
    * corpus; sums and minima of exact values are exact. Ordering is
    * total by construction (`orderCols` must pin a total order).
    */
  def clampedBalance(df: DataFrame, keyCol: String,
                     orderCols: Seq[String],
                     deltaCol: String): DataFrame = {
    require(orderCols.nonEmpty, "need a total order")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("_s", sum(col(deltaCol)).over(w))
      .withColumn("_m", min(col("_s")).over(w))
      .withColumn("balance", col("_s") - least(col("_m"), lit(0.0)))
      .drop("_s", "_m")
  }

  /** Interval union — islands & gaps (x44): merge a key's overlapping
    * [start, end) intervals into maximal covered islands and report
    * per-key coverage — the SLA/uptime/utilization query (covered
    * seconds, island count, longest gap) that naive `sum(end − start)`
    * gets wrong the moment two intervals overlap.
    *
    * Island detection is the classic gaps-and-islands window: order a
    * key's intervals by (start, end), take the running max of `end`
    * over STRICTLY PRECEDING rows, and open a new island exactly when
    * `start > that max` (end-exclusive: touching intervals merge). The
    * island id is then a running count of opens, and islands collapse
    * in one aggregation.
    *
    * 100 TB shape: one shuffle on the key; both windows and the
    * island groupBy share that partitioning. Per-key state is the
    * key's interval count — the usual per-key window bound.
    *
    * Determinism: epoch-second integer arithmetic end to end; the
    * (start, end, tiebreak) order is total.
    *
    * Returns one row per key: (key, n_intervals, n_islands,
    * covered_seconds, span_seconds, longest_gap_seconds, n_malformed)
    * — gap 0 for single-island keys. `n_malformed` counts the key's
    * rows with a null bound or `end < start`: malformed intervals are
    * EXCLUDED from coverage (an inverted interval covers nothing) but
    * never silently — a key whose every row is malformed still
    * reports, with zero coverage and its malformed count. Rows with a
    * null key have nothing to report under and stay out entirely.
    */
  def intervalCoverage(df: DataFrame, keyCol: String, startCol: String,
                       endCol: String, tiebreakCol: String): DataFrame = {
    val s = unix_timestamp(col(startCol))
    val e = unix_timestamp(col(endCol))
    val byStart = Window.partitionBy(col("key"))
      .orderBy(col("_s"), col("_e"), col("_tb"))
    val prevMax = max(col("_e"))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    val base = df
      .filter(col(keyCol).isNotNull && col(startCol).isNotNull &&
        col(endCol).isNotNull && col(endCol) >= col(startCol))
      .select(col(keyCol).as("key"), s.as("_s"), e.as("_e"),
        col(tiebreakCol).as("_tb"))
    val opened = base
      .withColumn("_pm", prevMax)
      .withColumn("_open",
        when(col("_pm").isNull || col("_s") > col("_pm"), 1L)
          .otherwise(0L))
      .withColumn("_gap",
        when(col("_open") === 1L && col("_pm").isNotNull,
          col("_s") - col("_pm")).otherwise(lit(0L)))
      .withColumn("_island",
        sum(col("_open")).over(
          byStart.rowsBetween(Window.unboundedPreceding, 0)))
    val islands = opened.groupBy(col("key"), col("_island"))
      .agg(count(lit(1)).as("_n"),
        min(col("_s")).as("_is"), max(col("_e")).as("_ie"),
        max(col("_gap")).as("_igap"))
    val covered = islands.groupBy(col("key"))
      .agg(sum(col("_n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("_ie") - col("_is")).as("covered_seconds"),
        (max(col("_ie")) - min(col("_is"))).as("span_seconds"),
        max(col("_igap")).as("longest_gap_seconds"))
    // the complement of base's validity filter, keyed — one more
    // partial-agg shuffle on the same key, and the full-outer join
    // keeps all-malformed keys visible instead of vanishing
    val malformed = df
      .filter(col(keyCol).isNotNull &&
        (col(startCol).isNull || col(endCol).isNull ||
          col(endCol) < col(startCol)))
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("_mf"))
    covered.join(malformed, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("n_intervals"), lit(0L)).as("n_intervals"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        coalesce(col("covered_seconds"), lit(0L)).as("covered_seconds"),
        coalesce(col("span_seconds"), lit(0L)).as("span_seconds"),
        coalesce(col("longest_gap_seconds"), lit(0L))
          .as("longest_gap_seconds"),
        coalesce(col("_mf"), lit(0L)).as("n_malformed"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences (x47): order each user's events by time, pair every
    * event with its successor, and report `P(next | prev)` — the
    * behavioral fingerprint behind next-action prediction, funnel
    * design, and bot detection (a scripted client's transition rows
    * are near-deterministic where organic ones are diffuse). The
    * matrix view of what [[graft.ext.Rollup]]-tier journey queries
    * (x41) read as whole paths.
    *
    * 100 TB shape: ONE shuffle on the user key feeds the successor
    * window (per-partition state = that user's event count, the usual
    * per-key window bound); pairs partial-aggregate to the
    * |event types|² matrix, and the row normalizer is a window over
    * that tiny frame. Nothing driver-side.
    *
    * Determinism: the per-user order is the total (ts, tiebreak)
    * order; pair counts are exact integers; probabilities round once
    * (6 dp).
    *
    * Returns (prev_type, next_type, n, p) — `p` normalized within
    * `prev_type`, so each matrix row sums to ~1 at the rounding grain.
    */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
                       typeCol: String = "event_type",
                       tsCol: String = "ts",
                       tiebreakCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val pairs = events
      // tiebreak non-null too: the streaming twin encodes it into a
      // non-nullable state field, so both forms must accept (and
      // reject) exactly the same inputs
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull && col(tiebreakCol).isNotNull)
      .select(col(userCol), col(typeCol).as("prev_type"),
        lead(col(typeCol), 1).over(byUser).as("next_type"))
      .filter(col("next_type").isNotNull)
    transitionRollup(pairs)
  }

  /** The matrix tail shared by [[transitionMatrix]] and the streaming
    * pair feed ([[graft.streaming.StreamingOps.transitionPairs]]):
    * exact pair counts, 6-dp row normalization over the |types|²
    * frame.
    */
  def transitionRollup(pairs: DataFrame): DataFrame = {
    val byPrev = Window.partitionBy(col("prev_type"))
    pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n").cast("double") /
          sum(col("n")).over(byPrev).cast("double"), 6).as("p"))
  }

  /** Per-user sequence likelihood under the corpus transition matrix
    * (x49): each user's event chain scored by the first-order Markov
    * model the corpus itself fits — `avg ln P(next | prev)` over the
    * user's successor pairs — and the bottom-`k` users reported. The
    * downstream read of x47's matrix: a user whose transitions are
    * RARE for this corpus (broken client, fraud path, scraper walking
    * pages no organic user chains) surfaces at the bottom; a scripted
    * bot hammering one common loop surfaces at the TOP of the same
    * ranking. x10/x24 flag volume anomalies; this flags ORDER
    * anomalies volume can't see.
    *
    * 100 TB shape: the pair frame is the audited x47 shuffle (one
    * user-keyed window), the matrix collapses to |types|² rows and
    * broadcasts back onto the pairs, per-user scores partial-agg, and
    * the bottom-k is `TakeOrderedAndProject`. Determinism is the t31
    * LM discipline: probabilities are IEEE divisions of exact longs,
    * each `ln` rounds at 9 dp into DECIMAL (order-free sum), the
    * average rounds once at 6 dp, ties on user id.
    */
  def sequenceLikelihood(events: DataFrame, k: Int = 20,
                         userCol: String = "user_id",
                         typeCol: String = "event_type",
                         tsCol: String = "ts",
                         tiebreakCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val pairs = graft.std.Materialize.once(events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull && col(tiebreakCol).isNotNull)
      .select(col(userCol), col(typeCol).as("prev_type"),
        lead(col(typeCol), 1).over(byUser).as("next_type"))
      .filter(col("next_type").isNotNull))
    val counts = pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("_n12"))
    val rowTot = counts.groupBy(col("prev_type"))
      .agg(sum(col("_n12")).as("_n1"))
    val probs = counts.join(rowTot, Seq("prev_type"))
    pairs.join(broadcast(probs), Seq("prev_type", "next_type"))
      .select(col(userCol),
        round(log(col("_n12").cast("double") / col("_n1").cast("double")),
          9).cast("decimal(28,9)").as("_contrib"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_contrib")).as("_lsum"))
      .select(col(userCol), col("n_pairs"),
        round(col("_lsum").cast("double") / col("n_pairs"), 6)
          .as("avg_logprob"))
      .orderBy(col("avg_logprob").asc, col(userCol).asc)
      .limit(k)
  }

  /** The transition model as a DRIVER-SIDE artifact: `(prev, next) →
    * round(ln P(next|prev), 9) × 1e9` as exact longs — what
    * [[graft.streaming.StreamingOps.sequenceScoreStream]] broadcasts
    * in its closure (t33's weight-table shape). |event types|² entries
    * — collecting it is the model-publish step, not a data collect.
    * The 9-dp HALF_UP round is [[sequenceLikelihood]]'s `round(log, 9)`
    * computed identically (same libm `ln`, same shortest-repr
    * BigDecimal rounding Catalyst's Round applies), so stream scores
    * reproduce the batch query bit for bit.
    */
  def transitionLogprobE9(events: DataFrame,
                          userCol: String = "user_id",
                          typeCol: String = "event_type",
                          tsCol: String = "ts",
                          tiebreakCol: String = "event_id")
      : Map[(String, String), Long] = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val counts = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull && col(tiebreakCol).isNotNull)
      .select(col(userCol), col(typeCol).as("prev_type"),
        lead(col(typeCol), 1).over(byUser).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n12"))
    val withTot = counts.join(
      counts.groupBy(col("prev_type")).agg(sum(col("n12")).as("n1")),
      Seq("prev_type"))
    withTot.collect().map { r =>
      val n12 = r.getAs[Long]("n12")
      val n1 = r.getAs[Long]("n1")
      (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) ->
        BigDecimal(math.log(n12.toDouble / n1))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
          .bigDecimal.movePointRight(9).longValueExact()
    }.toMap
  }

  def hourlyAnomalies(events: DataFrame, tsCol: String = "ts",
                      keyCol: String = "event_type", trailing: Int = 24,
                      zThreshold: Double = 3.0): DataFrame = {
    require(trailing >= 2, "need at least 2 trailing observations")
    // contract shared with the streaming form: a NULL timestamp has no
    // hour (dropped), a NULL key monitors as the "" series — and NULL
    // ordering inside the window never arises, which matters because
    // Spark sorts nulls first ascending while DuckDB defaults last
    val hourly = events
      .filter(col(tsCol).isNotNull)
      .groupBy(coalesce(col(keyCol), lit("")).as("key"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("key")).orderBy(col("hour"))
      .rowsBetween(-trailing, -1)
    val t = lit(trailing.toDouble)
    val nD = col("n").cast("double")
    val sD = col("_s").cast("double")
    val ssD = col("_ss").cast("double")
    val variance = (ssD - sD * sD / t) / lit((trailing - 1).toDouble)
    val z = when(variance > 0,
      round((nD - sD / t) / sqrt(variance), 6))
    hourly
      .withColumn("_hist", count(col("n")).over(w))
      .withColumn("_s", sum(col("n")).over(w))
      .withColumn("_ss", sum(col("n") * col("n")).over(w))
      .filter(col("_hist") === trailing)
      .select(col("key"), col("hour"), col("n"),
        round(sD / t, 6).as("trailing_mean"),
        z.as("zscore"),
        coalesce(z >= zThreshold || z <= -zThreshold, lit(false))
          .as("is_anomaly"))
  }

  /** Kaplan–Meier survival curve (x52): the right-censoring-correct
    * time-to-event readout x45's latency quantiles cannot be — x45
    * conditions on users who DID convert, silently dropping everyone
    * still pending, which biases every "how fast do users convert"
    * answer optimistic. KM keeps the pending users at risk until their
    * censoring time: at each death time t, `S(t) ⟵ S · (n−d)/n` over
    * the subjects still at risk (deaths-before-censoring at equal
    * times, the standard convention).
    *
    * Input: one row per subject with `duration_s` (time to event OR to
    * censoring, whole seconds) and `observed` (1 = event, 0 =
    * censored). Output: one row per death time — at-risk count, event
    * count, same-time censored count, and the survival estimate.
    *
    * Determinism — the x43 problem (a NON-associative sequential
    * recurrence) solved the x20 way: the product runs in 1e-9 FIXED
    * POINT. A 9-dp-double fold was tried first and diverged in the
    * last digit at sf0.01 (Spark's BigDecimal HALF_UP vs DuckDB's
    * double round at .5-ulp products — the exact failure x20
    * documents), so factors are truncating longs
    * `(n−d)·1e9 div n` and the survival product is a LEFT FOLD
    * `acc ⟵ acc·f div 1e9` over the duration-ordered factor list —
    * Spark's `aggregate` (seed 1e9; the first step is exact identity)
    * against DuckDB's `list_reduce` (seeds with the first factor
    * directly — the same value). Every intermediate is the same
    * integer in both engines; no transcendental anywhere (Π = exp(Σln)
    * would introduce the one libm call the repo has no cross-engine
    * contract for). The in-fold product `acc·f ≤ 1e18` stays inside
    * long range while `n ≤ ~9.2e9` — the Spark-side multiply runs in
    * DECIMAL(20,0) so even that bound only constrains the DuckDB
    * twin. A zero factor (everyone at risk dies) propagates 0
    * exactly.
    *
    * 100 TB shape: subjects collapse to |distinct durations| rows via
    * partial aggregation BEFORE any window; the cumulative at-risk
    * and fold windows run on that tiny frame single-partitioned —
    * bounded by the time resolution, not the corpus (and collapsible
    * further by flooring durations to coarser buckets upstream).
    */
  def kmSurvival(subjects: DataFrame): DataFrame = {
    val byDur = subjects
      .filter(col("duration_s").isNotNull && col("duration_s") >= 0)
      .groupBy(col("duration_s"))
      .agg(count(lit(1)).as("_m"),
        sum(col("observed").cast("long")).as("_d"))
    val ord = Window.orderBy(col("duration_s"))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val full = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val death = byDur
      .withColumn("_before",
        coalesce(sum(col("_m")).over(before), lit(0L)))
      .withColumn("_total", sum(col("_m")).over(full))
      .filter(col("_d") >= 1)
      .select(col("duration_s"),
        (col("_total") - col("_before")).as("n_risk"),
        col("_d").as("n_events"),
        (col("_m") - col("_d")).as("n_censored"))
      .withColumn("_f",
        expr("CAST((n_risk - n_events) * 1000000000 div n_risk" +
          " AS BIGINT)"))
    val run = Window.orderBy(col("duration_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    death
      .withColumn("_fs", collect_list(col("_f")).over(run))
      .select(col("duration_s"), col("n_risk"), col("n_events"),
        col("n_censored"),
        aggregate(col("_fs"), lit(1000000000L), (acc, f) =>
          ((acc.cast("decimal(10,0)") * f.cast("decimal(10,0)")) /
            lit(1000000000L).cast("decimal(10,0)")).cast("long"))
          .as("survival_e9"))
      .withColumn("survival",
        col("survival_e9").cast("double") / lit(1e9))
  }

  /** Per-entity inter-arrival cadence profile (x51): median and MAD of
    * the gaps between an entity's consecutive events — the
    * bot/automation fingerprint next to [[transitionMatrix]]'s WHAT
    * and [[sequenceLikelihood]]'s HOW-LIKELY: machines fire on timers
    * (MAD ≪ median), humans don't. `is_regular` flags entities with at
    * least `minGaps` gaps whose MAD is ≤ 10% of the median gap — which
    * includes the burst bot whose median gap is 0 (0 ≤ 0: maximally
    * regular, exactly the case to catch).
    *
    * Determinism (the robust-statistics twin problem x26 solved
    * globally, here PER GROUP): medians are the exact mid-rank rule in
    * integer milli-seconds — gaps floor to whole epoch seconds (the
    * x45 parity), the 1-or-2 middle order statistics sum exactly, and
    * `sum · 1000 div count` is exact for both counts (×1000 keeps the
    * 2-row average integral); the MAD's second median uses the same
    * rule on already-milli deviations, where the one possible .5
    * truncates identically under Spark's `div` and DuckDB's `//`.
    *
    * 100 TB shape: events collapse to (entity, gap) rows via the lag
    * window — the per-entity partition state every sequence operator
    * here carries (w9's stateful form is the streaming escape when one
    * entity's history breaks a task); the two median windows then run
    * on the GAP frame (|events| − |entities| skinny rows), and the
    * final rollup is one partial-agg shuffle. Nothing global, nothing
    * quadratic, no percentile sketch needed because the median is
    * per-group exact by construction.
    */
  def cadenceProfile(events: DataFrame, minGaps: Int = 5,
                     userCol: String = "user_id", tsCol: String = "ts",
                     tiebreakCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val gaps = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(tiebreakCol).isNotNull)
      .select(col(userCol).as("user_id"),
        (unix_timestamp(col(tsCol)) -
          lag(unix_timestamp(col(tsCol)), 1).over(byUser))
          .as("gap_s"))
      .filter(col("gap_s").isNotNull)
    cadenceRollup(gaps, minGaps)
  }

  /** The cadence tail shared by [[cadenceProfile]] and the streaming
    * gap feed ([[graft.streaming.StreamingOps.gapPairs]]): exact
    * per-user medians/MAD over a `(user_id, gap_s)` frame — the
    * two-stage split every sequence pipeline here uses (w8/w10), so
    * the batch and stateful forms cannot drift.
    */
  def cadenceRollup(gaps: DataFrame, minGaps: Int = 5): DataFrame = {
    require(minGaps >= 1, "need at least one gap to call a cadence")
    // exact per-group median in milli-units: the 1-or-2 middle order
    // statistics by mid-rank, summed, times 1000, divided by their
    // count — integral for both parities
    def midMedian(df: DataFrame, valCol: String, scale: Long,
                  out: String): DataFrame = {
      val w = Window.partitionBy(col("user_id")).orderBy(col(valCol))
      val n = Window.partitionBy(col("user_id"))
      df.select(col("user_id"), col(valCol),
          row_number().over(w).as("_rn"),
          count(lit(1)).over(n).as("_n"))
        // Column./ is DOUBLE division in Spark — the mid-rank bounds
        // must be the integer div both engines floor
        .filter(col("_rn") >= expr("(_n + 1) div 2") &&
          col("_rn") <= expr("(_n + 2) div 2"))
        .groupBy(col("user_id"))
        .agg(expr(s"CAST(SUM($valCol) * $scale div COUNT(*) AS BIGINT)")
          .as(out))
    }
    val med = midMedian(gaps, "gap_s", 1000L, "median_gap_milli")
    val devs = gaps.join(med, Seq("user_id"))
      .select(col("user_id"),
        abs(col("gap_s") * 1000L - col("median_gap_milli"))
          .as("dev_milli"))
    val mad = midMedian(devs, "dev_milli", 1L, "mad_gap_milli")
    val counts = gaps.groupBy(col("user_id"))
      .agg((count(lit(1)) + 1).as("n_events"),
        count(lit(1)).as("n_gaps"))
    counts.join(med, Seq("user_id")).join(mad, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("n_gaps"),
        col("median_gap_milli"), col("mad_gap_milli"),
        (col("n_gaps") >= minGaps &&
          col("mad_gap_milli") * 10 <= col("median_gap_milli"))
          .as("is_regular"))
  }

  /** Stationary event mix (x56): the long-run state distribution of
    * x47's Markov chain — where the transition matrix says "what
    * follows what", the stationary vector says what share of events
    * the system settles into PER TYPE if today's dynamics persist,
    * the steady-state capacity readout (x47 is the model, this is its
    * fixed point). Power iteration `π' = π·P` in e9 fixed point:
    * per-term `π_i · n_ij div n_i` on exact longs (counts, never
    * pre-rounded probabilities — one truncation per term, order-free
    * integer sums), seeded uniform at `1e9 div |states|`, `iters`
    * rounds pinned per iteration (the x20 lineage discipline).
    * Truncation only SHAVES, so Σπ drifts a few e-9 below 1e9 —
    * reported, not hidden, via `mass_e9` on every row.
    *
    * 100 TB shape: the ONLY corpus-sized work is x47's pair count
    * (one lead window + one partial-agg shuffle); the iteration runs
    * on the |types|² count frame — driver-tiny, exact.
    *
    * States are the types with outgoing transitions; a type with
    * inflow but no outflow would absorb mass (not present in this
    * corpus, and a real chain would add a self-loop).
    */
  def stationaryMix(events: DataFrame, iters: Int = 8,
                    userCol: String = "user_id",
                    typeCol: String = "event_type",
                    tsCol: String = "ts",
                    tiebreakCol: String = "event_id"): DataFrame = {
    require(iters >= 1, "need at least one power-iteration round")
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val pairs = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull && col(tiebreakCol).isNotNull)
      .select(col(typeCol).as("prev_type"),
        lead(col(typeCol), 1).over(byUser).as("next_type"))
      .filter(col("next_type").isNotNull)
    val counts = graft.std.Materialize.once(
      pairs.groupBy(col("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n12")))
    val rowTot = counts.groupBy(col("prev_type"))
      .agg(sum(col("n12")).as("n1"))
    val edges = graft.std.Materialize.once(
      counts.join(rowTot, Seq("prev_type")))
    val states = graft.std.Materialize.once(
      edges.select(col("prev_type").as("state")).distinct())
    val nStates = states.agg(count(lit(1)).as("_n"))
    var pi = graft.std.Materialize.once(
      states.crossJoin(broadcast(nStates))
        .select(col("state"),
          expr("CAST(1000000000 div _n AS BIGINT)").as("pi_e9")))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pi, edges("prev_type") === pi("state"))
        .select(col("next_type").as("state"),
          expr("CAST(pi_e9 * n12 div n1 AS BIGINT)").as("_t"))
        .groupBy(col("state")).agg(sum(col("_t")).as("_acc"))
      pi = graft.std.Materialize.once(
        states.join(contrib, Seq("state"), "left_outer")
          .select(col("state"),
            coalesce(col("_acc"), lit(0L)).as("pi_e9")))
    }
    val mass = pi.agg(sum(col("pi_e9")).as("mass_e9"))
    pi.crossJoin(broadcast(mass))
      .select(col("state").as("event_type"), col("pi_e9"),
        (col("pi_e9").cast("double") / lit(1e9)).as("pi"),
        col("mass_e9"))
  }

  /** EWMA forecast baseline (x53): per-series exponentially weighted
    * moving average of a daily metric, with the forecast residual
    * (today vs yesterday's EWMA) and spike/dip verdicts — the
    * smoothing complement of [[hourlyAnomalies]]'s trailing z-score:
    * z asks "how far from the recent mean", EWMA asks "how far from
    * the recency-weighted forecast", and the recursive form is what
    * operational monitors actually run.
    *
    * Semantics: the series is the per-(event_type, day) SUM(value);
    * EWMA seeds at the series' first day and then folds
    * `acc ← (α·x + (1−α)·acc)` day by day with α = alphaNum/alphaDen.
    * `residual_micro` is today's value minus YESTERDAY's EWMA (a true
    * one-step-ahead forecast error, null on each series' first day);
    * `is_spike` flags value > spikeFactor × forecast, `is_dip` the
    * reciprocal — both non-null booleans.
    *
    * Determinism: daily sums ride DECIMAL(18,6) (order-free), land in
    * exact micro-units, and the EWMA — a NON-associative recurrence,
    * like x52's survival product — is replayed as an integer
    * fixed-point left fold `(αN·x + (αD−αN)·acc) div αD` over the
    * day-ordered value list, so both engines truncate identically at
    * every step (DuckDB `list_reduce` seeds with the first element,
    * matching the `element_at(_vs, 1)` seed here). All operands stay
    * positive (guarded by the fold's inputs being sums of positive
    * values), so Spark's truncating `div` and DuckDB's flooring `//`
    * cannot disagree. Bound: `value_micro` must stay below
    * ~9.2e18/alphaDen — at 1e12 micro-units/day/series (a $1M/day
    * series) the headroom is six orders of magnitude.
    *
    * 100 TB shape: the event corpus collapses to |series| × |days|
    * rows via ONE partial-agg shuffle before any window; the
    * collect_list + fold runs per series over that bounded daily
    * frame (a year is 365 elements), never over events. Skewed
    * event_types skew the COUNTER frame, not the event shuffle.
    */
  def ewmaBaseline(events: DataFrame,
                   alphaNum: Long = 3L, alphaDen: Long = 10L,
                   spikeFactor: Long = 2L,
                   keyCol: String = "event_type", tsCol: String = "ts",
                   valueCol: String = "value"): DataFrame = {
    require(alphaNum >= 1 && alphaNum <= alphaDen,
      "alpha must lie in (0, 1]")
    val run = Window.partitionBy(col("series")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val folded = dailySeries(events, keyCol, tsCol, valueCol)
      .withColumn("_vs", collect_list(col("value_micro")).over(run))
      .withColumn("ewma_micro",
        expr(s"aggregate(slice(_vs, 2, greatest(size(_vs) - 1, 0)), " +
          "element_at(_vs, 1), (acc, x) -> " +
          s"($alphaNum * x + ${alphaDen - alphaNum} * acc) " +
          s"div $alphaDen)"))
      .drop("_vs")
    ewmaVerdicts(folded, spikeFactor)
  }

  /** Holt linear-trend forecast (x68): the x53 EWMA extended with a
    * TREND state — level `l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})`,
    * trend `b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}`, one-step-ahead
    * forecast `l_{t−1} + b_{t−1}`. EWMA (x53) lags any ramp by
    * construction — on steadily growing traffic every day reads as a
    * spike; Holt's trend term absorbs the ramp so the residual reads
    * genuine surprise. The capacity-planning pair: x53 prices the
    * baseline, x57 the seasonality, this the TREND.
    *
    * Fixed-point discipline: states ride exact micro-unit longs; the
    * non-associative recurrence replays per row over its day-ordered
    * prefix list (the x53 collect_list shape) with a named_struct
    * (l, b) accumulator seeded (x_1, 0). The trend can go NEGATIVE,
    * where Spark's truncating `div` and DuckDB's truncating `//`
    * still agree — but both are made true FLOOR divisions via the
    * shared offset identity `(n + C·d) div d − C` (exact for
    * |n| < C·d, C = 4e17 — daily sums beyond ~4e17 micro-units are
    * out of contract, enforced loudly), so every step is one floor
    * division per state in both engines. The DuckDB twin folds the
    * same steps with the l′ term let-bound through a one-element
    * `list_transform` — duplicating it inside the struct literal
    * trips a DuckDB 1.0 lambda-CSE bug (stale accumulator reads,
    * found while validating this operator; the let-bind sidesteps
    * it and is pinned by the differential spec).
    *
    * 100 TB shape: identical to x53 — the corpus collapses once
    * through the shared guarded [[dailySeries]]; the fold runs per
    * series over the bounded daily frame, never over events.
    *
    * Returns (series, day, n_events, value_micro, level_micro,
    * trend_micro, forecast_micro, residual_micro, level, trend).
    */
  def holtTrend(events: DataFrame,
                alphaNum: Long = 3L, alphaDen: Long = 10L,
                betaNum: Long = 2L, betaDen: Long = 10L,
                keyCol: String = "event_type", tsCol: String = "ts",
                valueCol: String = "value"): DataFrame = {
    require(alphaNum >= 1 && alphaNum <= alphaDen,
      "alpha must lie in (0, 1]")
    require(betaNum >= 1 && betaNum <= betaDen,
      "beta must lie in (0, 1]")
    val C = 400000000000000000L
    def fdiv(n: String, d: Long): String = s"(($n) + ${C}L * $d) div $d - ${C}L"
    val lStep = fdiv(s"$alphaNum * x + ${alphaDen - alphaNum} * " +
      "(acc.l + acc.b)", alphaDen)
    val bStep = fdiv(s"$betaNum * (($lStep) - acc.l) + " +
      s"${betaDen - betaNum} * acc.b", betaDen)
    val run = Window.partitionBy(col("series")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ord = Window.partitionBy(col("series")).orderBy(col("day"))
    val folded = holtDaily(events, keyCol, tsCol, valueCol)
      .withColumn("_vs", collect_list(col("value_micro")).over(run))
      .withColumn("_st",
        expr(s"aggregate(slice(_vs, 2, greatest(size(_vs) - 1, 0)), " +
          "named_struct('l', element_at(_vs, 1), 'b', 0L), " +
          s"(acc, x) -> named_struct('l', $lStep, 'b', $bStep))"))
      .drop("_vs")
      .select(col("series"), col("day"), col("n_events"),
        col("value_micro"), col("_st.l").as("level_micro"),
        col("_st.b").as("trend_micro"))
    holtDisplay(folded
      .withColumn("_pl", lag(col("level_micro"), 1).over(ord))
      .withColumn("_pb", lag(col("trend_micro"), 1).over(ord))
      .withColumn("forecast_micro", col("_pl") + col("_pb"))
      .withColumn("residual_micro",
        col("value_micro") - col("forecast_micro")))
  }

  /** The x68 input contract in one place — [[dailySeries]]'s guarded
    * collapse plus the Holt fixed-point magnitude bound, enforced as
    * loudly as the positivity contract: states stay O(max daily sum),
    * so inputs below 4e16 keep every fold numerator under C·d = 4e18
    * with two orders of margin. SHARED by the batch fold and the w13
    * streaming feed so the twins cannot diverge on failure behavior.
    */
  def holtDaily(events: DataFrame, keyCol: String = "event_type",
                tsCol: String = "ts",
                valueCol: String = "value"): DataFrame =
    dailySeries(events, keyCol, tsCol, valueCol)
      .withColumn("value_micro", expr(
        "IF(assert_true(value_micro < 40000000000000000, " +
          "concat('holtTrend: daily sum ', value_micro, " +
          "' exceeds the 4e16 fixed-point bound')) IS NULL, " +
          "value_micro, CAST(NULL AS BIGINT))"))

  /** The x68 display tail shared with the streaming feed
    * ([[graft.streaming.StreamingOps.holtPoints]]): column order and
    * the micro→unit doubles, so the batch fold and the stateful form
    * emit byte-identical frames and w13 shares x68's oracle verbatim.
    */
  def holtDisplay(points: DataFrame): DataFrame =
    points.select(col("series"), col("day"), col("n_events"),
      col("value_micro"), col("level_micro"), col("trend_micro"),
      col("forecast_micro"), col("residual_micro"),
      (col("level_micro").cast("double") / lit(1e6)).as("level"),
      (col("trend_micro").cast("double") / lit(1e6)).as("trend"))

  /** Seasonality autocorrelation (x57): per-series Pearson r between
    * the daily value series and its own calendar-lagged self, at
    * fixed lags — lag 1 reads momentum (does a big day predict
    * another?), lag 7 reads WEEKLY seasonality, the number a capacity
    * planner checks before trusting any day-over-day comparison.
    * Sits next to x53 (EWMA prices the trend, this prices the
    * periodicity) and x10 (whose trailing z-scores false-positive
    * every Monday when lag-7 autocorrelation is high).
    *
    * Semantics: the series is the shared [[dailySeries]] collapse
    * (same contract, including positivity); pairs join day d to day
    * d − lag WITHIN each series (calendar lag, not row lag — missing
    * days drop the pair rather than silently comparing non-adjacent
    * rows), and r is [[Features.pearson]]'s exact-moment form —
    * DECIMAL linear sums, DECIMAL(38,12) product moments of
    * deterministic doubles, NULL on zero variance, never the
    * shuffle-order-dependent `corr` aggregate.
    *
    * 100 TB shape: the event corpus collapses once (ONE partial-agg
    * shuffle); each lag is a self-equi-join + five-moment partial agg
    * on the |series| × |days| daily frame. Lags are a tiny fixed
    * list.
    */
  def autocorrelation(events: DataFrame, lags: Seq[Int] = Seq(1, 7),
                      keyCol: String = "event_type",
                      tsCol: String = "ts",
                      valueCol: String = "value"): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1),
      "lags must be positive")
    val daily = graft.std.Materialize.once(
      dailySeries(events, keyCol, tsCol, valueCol)
        .select(col("series"), col("day"),
          (col("value_micro").cast("double") / 1000000.0).as("_v")))
    lags.map { lag =>
      val cur = daily.select(col("series"), col("day"),
        col("_v").as("_x"))
      val prev = daily.select(col("series"),
        date_add(col("day"), lag).as("day"), col("_v").as("_y"))
      Features.pearson(cur.join(prev, Seq("series", "day")),
          "series", "_x", "_y")
        .select(col("series"), lit(lag).cast("long").as("lag"),
          col("n").as("n_pairs"), col("pearson_r").as("autocorr"))
    }.reduce(_ unionByName _)
  }

  /** The x53 daily collapse, shared with the streaming EWMA feed: per
    * (series, day) event counts and exact micro-unit value sums — the
    * ONE corpus-sized shuffle of the whole family.
    *
    * Contract: daily sums must be NON-NEGATIVE, enforced loudly — the
    * EWMA fold's truncating `div` (Spark) and flooring `//` (DuckDB)
    * agree only on non-negative operands, and value_micro ≥ 0 on
    * every day keeps the folded acc ≥ 0 inductively. A negative daily
    * sum would silently split the batch twin, the oracle, and the
    * streaming fold three ways; instead the job fails (both twins
    * guard — the oracle's `error(...)` arm is the same contract).
    */
  def dailySeries(events: DataFrame, keyCol: String = "event_type",
                  tsCol: String = "ts",
                  valueCol: String = "value"): DataFrame =
    events
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("series"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).as("_v"))
      .withColumn("value_micro", expr(
        "IF(assert_true(coalesce(_v >= 0, true), concat('dailySeries: " +
          "negative daily sum ', _v, ' for series ', series, " +
          "' violates the EWMA positivity contract')) IS NULL, " +
          "CAST(_v * 1000000 AS BIGINT), CAST(NULL AS BIGINT))"))
      .drop("_v")

  /** The x53 verdict tail shared with the streaming EWMA feed
    * ([[graft.streaming.StreamingOps.ewmaPoints]]): from a
    * `(series, day, n_events, value_micro, ewma_micro)` frame, the
    * one-step-ahead residual vs the PREVIOUS day's EWMA and the
    * spike/dip verdicts — the w11 two-stage split, so the batch fold
    * and the stateful form cannot drift.
    */
  def ewmaVerdicts(folded: DataFrame,
                   spikeFactor: Long = 2L): DataFrame = {
    require(spikeFactor >= 1, "spikeFactor must be >= 1")
    val ord = Window.partitionBy(col("series")).orderBy(col("day"))
    folded
      .withColumn("_prev", lag(col("ewma_micro"), 1).over(ord))
      .select(col("series"), col("day"), col("n_events"),
        col("value_micro"), col("ewma_micro"),
        (col("ewma_micro").cast("double") / lit(1e6)).as("ewma"),
        (col("value_micro") - col("_prev")).as("residual_micro"),
        (col("_prev").isNotNull &&
          col("value_micro") > col("_prev") * spikeFactor)
          .as("is_spike"),
        (col("_prev").isNotNull &&
          col("value_micro") * spikeFactor < col("_prev"))
          .as("is_dip"))
  }
}
