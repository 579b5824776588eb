package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature preparation for model training — the transforms a training
  * pipeline applies between the warehouse and the trainer: bucketized
  * and standardized numeric features. Both are two-phase at 100 TB:
  * a tiny statistics aggregate (boundaries, moments) broadcast back
  * over one full scan — the fact side never shuffles.
  */
object Features {

  /** Equal-frequency (quantile) binning: each row's value is assigned
    * the bucket cut by the exact interpolated percentile boundaries
    * (the x13 kernel — `percentile(value, i/bins)` for i = 1..bins-1,
    * 6-dp rounded), `bin = #{boundaries <= value}` ∈ [0, bins-1].
    * Boundary assignment — not `ntile` — so the per-row verdict is a
    * pure function of (value, boundaries): engine-independent, and at
    * scale a BROADCAST of bins-1 doubles over one scan instead of the
    * single-partition global-rank window ntile needs.
    *
    * `exact = false` swaps the boundary source for `approx_percentile`
    * (mergeable sketch, one pass at any scale, same schema) — the x13
    * dual-mode discipline; bucket populations then deviate only where
    * the sketch's boundary estimate does.
    *
    * NULL values get NULL bins (a missing feature stays missing).
    */
  def equalFreqBins(df: DataFrame, valueCol: String, bins: Int,
                    exact: Boolean = true): DataFrame = {
    require(bins >= 2, "need at least two bins")
    val cuts = (1 until bins).map(i => i.toDouble / bins)
    val qArr = cuts.map(q => s"${q}D").mkString("array(", ",", ")")
    val agg =
      if (exact) expr(s"percentile($valueCol, $qArr)")
      else expr(s"approx_percentile($valueCol, $qArr, 10000)")
    val bounds = df.agg(agg.as("_raw"))
      .select(transform(col("_raw"), b => round(b, 6)).as("_bounds"))
    df.crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col(valueCol).isNull, lit(null).cast("int"))
          .otherwise(aggregate(col("_bounds"), lit(0),
            (acc, b) => acc + when(col(valueCol) >= b, 1).otherwise(0))))
      .drop("_bounds")
  }

  /** Robust per-group outlier score (x26): the modified z-score
    * `(v - median) / (1.4826 · MAD)` with `MAD = median(|v - median|)`
    * — immune to the outliers it hunts, unlike [[zscore]]'s moments
    * (one extreme row inflates stddev and hides itself). `is_outlier`
    * applies the Iglewicz–Hoaglin |score| > 3.5 rule.
    *
    * `exact = true` uses the exact interpolated median (the x13 oracle
    * kernel); `exact = false` swaps both medians for the
    * `approx_percentile` sketch — one pass at any scale, same schema.
    * Two stats passes either way (the second median is of deviations
    * from the first), each a tiny per-group aggregate broadcast back.
    * Zero-MAD groups (≥ half the values at the median) and NULL values
    * produce NULL scores.
    */
  def robustZscore(df: DataFrame, groupCol: String, valueCol: String,
                   exact: Boolean = true): DataFrame = {
    def med(c: String) =
      if (exact) expr(s"percentile($c, 0.5D)")
      else expr(s"approx_percentile($c, 0.5D, 10000)")
    val medians = df.groupBy(col(groupCol))
      .agg(round(med(valueCol), 6).as("_med"))
    val withDev = df.join(broadcast(medians), Seq(groupCol))
      .withColumn("_dev", abs(col(valueCol) - col("_med")))
    val mads = withDev.groupBy(col(groupCol))
      .agg(round(med("_dev"), 6).as("_mad"))
    withDev.join(broadcast(mads), Seq(groupCol))
      .withColumn("robust_z",
        when(col("_mad") > 0,
          round((col(valueCol) - col("_med")) /
            (lit(1.4826) * col("_mad")), 6)))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) > 3.5, lit(false)))
      .drop("_med", "_dev", "_mad")
  }

  /** Per-group Pearson correlation (x28): the relationship screen a
    * warehouse runs across measure pairs (does price predict delay?
    * does length predict quality?) — one partial-agg pass to five
    * moment sums per group. Linear sums run as DECIMAL(18,6); the
    * cross/square moments use the s7/s10 device — the double×double
    * product is IEEE-exact-rounded (deterministic), and its
    * DECIMAL(38,12) cast sums order-free. (Squaring IN decimal is a
    * trap: DuckDB's DECIMAL(18)×DECIMAL(18) multiplies in int64 and
    * overflows on price-sized values, and the 38-cap rescaling rules
    * differ between engines.) Zero-variance sides produce NULL r, not
    * ±∞; the built-in `corr` aggregate is a running double —
    * shuffle-order-dependent — which is why this never uses it.
    */
  def pearson(df: DataFrame, groupCol: String, xCol: String,
              yCol: String): DataFrame = {
    val xd = col(xCol).cast("double")
    val yd = col(yCol).cast("double")
    val dec = "decimal(38,12)"
    val m = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol)).agg(
        count(lit(1)).as("n"),
        sum(col(xCol).cast("decimal(18,6)")).as("_sx"),
        sum(col(yCol).cast("decimal(18,6)")).as("_sy"),
        sum((xd * xd).cast(dec)).as("_sxx"),
        sum((yd * yd).cast(dec)).as("_syy"),
        sum((xd * yd).cast(dec)).as("_sxy"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val covN = n * d("_sxy") - d("_sx") * d("_sy")
    val varX = n * d("_sxx") - d("_sx") * d("_sx")
    val varY = n * d("_syy") - d("_sy") * d("_sy")
    m.select(col(groupCol), col("n"),
      when(varX > 0 && varY > 0,
        round(covN / (sqrt(varX) * sqrt(varY)), 6)).as("pearson_r"))
  }

  /** Per-group z-score standardization: `(v - mean) / stddev` with
    * POPULATION moments, the global-feature complement of the trailing
    * z-score monitor (x10). Moments come from DECIMAL(38,6) sums of
    * `v` and `v²` — exact and associative, so shuffle order cannot
    * move the mean or the variance (doubles would); mean, std, and
    * the score each round to 6 dp so the division runs on identical
    * doubles in both engines. Zero-variance groups (and NULL values)
    * produce NULL scores — a constant feature has no z.
    *
    * 100 TB shape: one partial-agg shuffle to |groups| moment rows,
    * broadcast join back, per-row arithmetic in the same scan.
    */
  def zscore(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    // (18,6): the square stays (37,12) under BOTH engines' decimal
    // multiplication rules — at (38,6) the two engines overflow-handle
    // the product differently
    val v = col(valueCol).cast("decimal(18,6)")
    val moments = df.groupBy(col(groupCol)).agg(
      count(col(valueCol)).as("_n"),
      sum(v).as("_s"),
      sum(v * v).as("_ss"))
    val mean = round(col("_s").cast("double") / col("_n"), 6)
    val variance =
      round((col("_ss").cast("double") -
        col("_s").cast("double") * col("_s").cast("double") / col("_n"))
        / col("_n"), 6)
    // greatest(…, 0): the ss − s²/n cancellation can land an epsilon
    // below zero in doubles; sqrt of that must not NaN the group
    val withStats = moments.select(col(groupCol),
      mean.as("_mean"),
      round(sqrt(greatest(variance, lit(0.0))), 6).as("_std"))
    df.join(broadcast(withStats), Seq(groupCol))
      .withColumn("zscore",
        when(col("_std") > 0,
          round((col(valueCol) - col("_mean")) / col("_std"), 6)))
      .drop("_mean", "_std")
  }

  /** RFM customer segmentation (x39): recency (days since last order,
    * against the corpus max date), frequency (order count) and
    * monetary (DECIMAL-summed spend) per customer, each scored 1–5 by
    * the exact interpolated quintile boundaries of the CUSTOMER-level
    * distribution (the [[equalFreqBins]] boundary discipline — a pure
    * function of (value, bounds), never `ntile`'s global-rank window),
    * then a fixed CASE ladder names the segment. Recency scores
    * INVERTED (most recent quintile = 5), the marketing convention.
    *
    * 100 TB shape: one partial-agg shuffle to |customers| rows; the
    * three boundary arrays are ONE aggregate over that frame (12
    * doubles broadcast); scoring is a per-row expression. The fact
    * table is scanned once.
    *
    * Determinism: recency/frequency are exact integers; monetary is a
    * DECIMAL(38,6) order-free sum; boundaries are 6-dp-rounded
    * interpolated percentiles over identical inputs (the x13/x23
    * cross-engine kernel), so every score is a comparison of identical
    * doubles.
    */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
                  amountCol: String): DataFrame = {
    val perCust = graft.std.Materialize.once {
      val byCust = orders
        .filter(col(custCol).isNotNull && col(dateCol).isNotNull)
        .groupBy(col(custCol))
        .agg(max(col(dateCol)).as("_last"),
          count(lit(1)).as("frequency"),
          round(sum(col(amountCol).cast("decimal(38,6)")), 6)
            .cast("double").as("monetary"))
      val ref = byCust.agg(max(col("_last")).as("_ref"))
      byCust.crossJoin(broadcast(ref))
        .withColumn("recency_days",
          datediff(to_date(col("_ref")), to_date(col("_last"))))
        .drop("_last", "_ref")
    }
    val cuts = Seq(0.2, 0.4, 0.6, 0.8)
    val qArr = cuts.map(q => s"${q}D").mkString("array(", ",", ")")
    def bounds(c: String) =
      transform(expr(s"percentile($c, $qArr)"), b => round(b, 6))
    val allBounds = perCust.agg(
      bounds("recency_days").as("_rb"),
      bounds("frequency").as("_fb"),
      bounds("monetary").as("_mb"))
    def scoreUp(v: Column, bs: Column) =
      aggregate(bs, lit(1), (acc, b) => acc + when(v >= b, 1).otherwise(0))
    val scored = perCust.crossJoin(broadcast(allBounds))
      .withColumn("r_score",
        lit(6) - scoreUp(col("recency_days"), col("_rb")))
      .withColumn("f_score", scoreUp(col("frequency"), col("_fb")))
      .withColumn("m_score", scoreUp(col("monetary"), col("_mb")))
      .drop("_rb", "_fb", "_mb")
    scored.withColumn("segment",
      when(col("r_score") >= 4 && col("f_score") >= 4 &&
        col("m_score") >= 4, lit("champion"))
        .when(col("f_score") >= 4, lit("loyal"))
        .when(col("m_score") >= 4, lit("big_spender"))
        .when(col("r_score") <= 2 && col("f_score") >= 3, lit("at_risk"))
        .when(col("r_score") <= 2, lit("hibernating"))
        .otherwise(lit("regular")))
  }
}
