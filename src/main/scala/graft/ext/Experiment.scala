package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Controlled-experiment readout — the A/B analysis every product
  * analytics stack runs on its event stream: users split into arms by
  * a deterministic hash of their id, per-arm conversion rates on named
  * target events, and the two-proportion z statistic that says whether
  * the arms differ beyond chance.
  *
  * 100 TB shape: one partial-agg shuffle to |users| rows (the per-user
  * conversion flags), then a tiny conditional aggregate to ONE row of
  * arm totals — the z arithmetic runs on scalars. The event stream is
  * scanned once regardless of how many target metrics are read out.
  *
  * Determinism: counts are exact integers; every rate and the z
  * statistic are IEEE double expressions over those integers, written
  * identically in the oracle twin, rounded once at the end (6 dp).
  */
object Experiment {

  /** Two-proportion z-test per target event type. `armOf` maps the
    * user id column to arm 0 (control) / 1 (treatment) — deterministic
    * by construction (the repo's no-RNG rule); rows with null user ids
    * are dropped. Conversion = the user emitted ≥ 1 event of the
    * target type.
    *
    * Returns one row per target: (metric, n_control, n_treatment,
    * n_unassigned, conv_control, conv_treatment, p_control,
    * p_treatment, lift, z) — z null when an arm is empty or the pooled
    * rate is degenerate (0 or 1), where the statistic is undefined.
    * `n_unassigned` counts users whose `armOf` result is neither 0 nor
    * 1 (including null): a correctly wired split reports 0, and a
    * miswired arm function (1/2 arms, booleans, a raw bucket id) shows
    * up as a visible population loss instead of silently shrinking
    * both arms.
    */
  def abTest(events: DataFrame, userCol: String, typeCol: String,
             targets: Seq[String], armOf: Column => Column): DataFrame = {
    require(targets.nonEmpty, "need at least one target metric")
    val flags = targets.zipWithIndex.map { case (t, i) =>
      max(when(col(typeCol) === t, 1).otherwise(0)).as(s"_c$i")
    }
    val users = events.filter(col(userCol).isNotNull)
      .groupBy(col(userCol))
      .agg(flags.head, flags.tail: _*)
      .withColumn("_arm", armOf(col(userCol)))
    // coalesce: an EMPTY experiment (or one-armed split) must report
    // zero counts, not null — sum over no rows is null in SQL
    val armAggs =
      Seq(coalesce(sum(when(col("_arm") === 0, 1).otherwise(0)), lit(0L))
        .as("n_a"),
        coalesce(sum(when(col("_arm") === 1, 1).otherwise(0)), lit(0L))
          .as("n_b"),
        // `=== 0 / === 1` are null-safe here only because the otherwise
        // branch counts them: null arms land in n_u, never in an arm
        coalesce(sum(when(col("_arm") === 0 || col("_arm") === 1, 0)
          .otherwise(1)), lit(0L)).as("n_u")) ++
        targets.indices.flatMap { i =>
          Seq(coalesce(sum(when(col("_arm") === 0, col(s"_c$i"))
            .otherwise(0)), lit(0L)).as(s"ca$i"),
            coalesce(sum(when(col("_arm") === 1, col(s"_c$i"))
              .otherwise(0)), lit(0L)).as(s"cb$i"))
        }
    val tot = users.agg(armAggs.head, armAggs.tail: _*)
    val perMetric = targets.zipWithIndex.map { case (t, i) =>
      val na = col("n_a").cast("double")
      val nb = col("n_b").cast("double")
      val ca = col(s"ca$i").cast("double")
      val cb = col(s"cb$i").cast("double")
      val pa = ca / na
      val pb = cb / nb
      val pooled = (ca + cb) / (na + nb)
      val se = sqrt(pooled * (lit(1.0) - pooled) *
        (lit(1.0) / na + lit(1.0) / nb))
      tot.select(lit(t).as("metric"),
        col("n_a").as("n_control"), col("n_b").as("n_treatment"),
        col("n_u").as("n_unassigned"),
        col(s"ca$i").as("conv_control"), col(s"cb$i").as("conv_treatment"),
        when(col("n_a") > 0, round(pa, 6)).as("p_control"),
        when(col("n_b") > 0, round(pb, 6)).as("p_treatment"),
        when(col("n_a") > 0 && col("n_b") > 0, round(pb - pa, 6))
          .as("lift"),
        when(col("n_a") > 0 && col("n_b") > 0 &&
          pooled > 0 && pooled < 1,
          round((pb - pa) / se, 6)).as("z"))
    }
    perMetric.reduce(_ unionAll _)
  }

  /** Rank AUC (t67): the probability a random positive outranks a
    * random negative, tie-corrected — `(wins + ties/2) / (P·N)`, the
    * Mann-Whitney U readout every classifier eval needs before a
    * score becomes a filter threshold. Computed WITHOUT the pairwise
    * cross join: rows collapse to per-score (n_pos, n_neg) groups
    * (a partial-agg shuffle to |distinct scores| rows), a window
    * ordered by score accumulates the negatives strictly below each
    * group, and `wins = Σ n_pos·neg_below`, `ties = Σ n_pos·n_neg` —
    * every count an exact integer, so AUC lands in the e9 integer
    * discipline: `auc_e9 = (2·wins + ties)·1e9 div (2·P·N)`.
    *
    * Null scores/labels are excluded (a score that didn't evaluate
    * can't rank). One output row: populations, wins, ties, auc.
    */
  def rankAuc(scored: DataFrame, scoreCol: String,
              labelCol: String): DataFrame = {
    val grouped = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("_s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("_np"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("_nn"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_s").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    grouped
      .withColumn("_below", coalesce(sum(col("_nn")).over(w), lit(0L)))
      .agg(sum(col("_np")).as("n_pos"), sum(col("_nn")).as("n_neg"),
        sum(col("_np") * col("_below")).as("wins"),
        sum(col("_np") * col("_nn")).as("ties"))
      .select(col("n_pos"), col("n_neg"), col("wins"), col("ties"),
        expr("CAST(CAST(2 * wins + ties AS DECIMAL(38,0)) * 1000000000 " +
          "div (2 * n_pos * n_neg) AS BIGINT)").as("auc_e9"))
      .withColumn("auc", col("auc_e9").cast("double") / lit(1e9))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic (v8): the max
    * absolute gap between two empirical CDFs — the drift detector
    * that needs no binning choice (v16's PSI prices drift through
    * bins; KS is the bin-free complement). Exact integer form: at
    * every observed value x, `|F1(x) − F2(x)| = |c1(x)·n2 − c2(x)·n1|
    * / (n1·n2)` — the numerator is an exact BIGINT, so the max and
    * its argmax (smallest value on ties) are deterministic, and the
    * statistic lands in the e9 integer discipline.
    *
    * Plan shape: each side partial-aggregates to per-value counts,
    * the merged value support gets both cumulative counts from one
    * ordered window, one max picks the gap — no cross join, shuffle
    * bounded by |distinct values|.
    */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val ca = a.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("_v")).agg(count(lit(1)).as("_c1"))
    val cb = b.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("_v")).agg(count(lit(1)).as("_c2"))
    val merged = ca.join(cb, Seq("_v"), "full_outer")
      .select(col("_v"), coalesce(col("_c1"), lit(0L)).as("_c1"),
        coalesce(col("_c2"), lit(0L)).as("_c2"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("_v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val n1c = ca.agg(sum(col("_c1")).as("_n1"))
    val n2c = cb.agg(sum(col("_c2")).as("_n2"))
    merged
      .withColumn("_f1", sum(col("_c1")).over(w))
      .withColumn("_f2", sum(col("_c2")).over(w))
      .crossJoin(broadcast(n1c)).crossJoin(broadcast(n2c))
      .select(col("_v"),
        abs(col("_f1") * col("_n2") - col("_f2") * col("_n1"))
          .as("_gap"), col("_n1"), col("_n2"))
      .orderBy(col("_gap").desc, col("_v").asc)
      .limit(1)
      .select(col("_n1").as("n_a"), col("_n2").as("n_b"),
        col("_gap").as("ks_num"), col("_v").as("at_value"),
        expr("CAST(CAST(_gap AS DECIMAL(38,0)) * 1000000000 " +
          "div (_n1 * _n2) AS BIGINT)").as("ks_e9"))
      .withColumn("ks", col("ks_e9").cast("double") / lit(1e9))
  }

  /** Calibration curve (t70): the reliability diagram next to
    * [[rankAuc]] — t67 prices how well a score RANKS, this prices
    * whether its MAGNITUDE means anything: docs bucketed into
    * equal-WIDTH score bins, per bin the positive share. A calibrated
    * score's share climbs with the bin; a ranking-only score can ace
    * AUC while the curve is flat in the middle.
    *
    * Bins are equal-width over the observed [min, max] — NOT ntile:
    * equal-frequency deciles need a global sort into one task (the
    * anti-pattern), where `(score − min) · bins div (max − min + 1)`
    * is a per-row expression after one broadcast min/max pass, so the
    * corpus never globally sorts and the only shuffle is the |bins|
    * partial agg. Integer scores in, exact integer bin arithmetic,
    * fixed-point shares — nothing rounds until display.
    *
    * Returns one row per non-empty bin: (bin, lo_score, hi_score,
    * n_docs, n_pos, pos_share_e9, pos_share).
    */
  def calibrationCurve(scored: DataFrame, scoreCol: String,
                       labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, "need at least one bin")
    val bounds = scored.agg(min(col(scoreCol)).as("_lo"),
      max(col(scoreCol)).as("_hi"))
    scored.crossJoin(broadcast(bounds))
      .select(
        expr(s"CAST(($scoreCol - _lo) * $bins " +
          "div (_hi - _lo + 1) AS INT)").as("bin"),
        col(scoreCol).as("_s"),
        col(labelCol).cast("long").as("_y"))
      .groupBy(col("bin"))
      .agg(min(col("_s")).as("lo_score"), max(col("_s")).as("hi_score"),
        count(lit(1)).as("n_docs"), sum(col("_y")).as("n_pos"))
      .select(col("bin"), col("lo_score"), col("hi_score"),
        col("n_docs"), col("n_pos"),
        expr("CAST(CAST(n_pos AS DECIMAL(38,0)) * 1000000000 " +
          "div n_docs AS BIGINT)").as("pos_share_e9"))
      .withColumn("pos_share",
        col("pos_share_e9").cast("double") / lit(1e9))
  }
}
