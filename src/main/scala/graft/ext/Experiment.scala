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
}
