package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derived metrics + data-quality flags (SURVEY §2.2 P8–P11;
  * `/root/reference/Project.py:128-155`), with pandas-parity null handling:
  *  - ratios are null (not error, not ±inf) when the guard fails;
  *  - flags are **non-null booleans**: pandas `NaN < 0` is `False`, so every
  *    comparison is wrapped in `coalesce(..., false)`.
  * Presence-guarded like the reference's `if col in df.columns`.
  */
object Metrics {

  private def has(df: DataFrame, cols: String*): Boolean =
    cols.forall(df.columns.contains)

  /** P8 — average selling price (`Project.py:132-135`):
    * `total_line_price / quantity` when `fillna(0) != 0`, else null.
    */
  def withAsp(df: DataFrame): DataFrame =
    if (!has(df, "quantity", "total_line_price")) df
    else df.withColumn("asp",
      when(coalesce(col("quantity"), lit(0.0)) =!= 0,
        col("total_line_price") / col("quantity")))

  /** P9/P10 — COGS, gross margin, guarded gm ratio
    * (`Project.py:138-144`).
    */
  def withMargins(df: DataFrame): DataFrame =
    if (!has(df, "last_cost", "quantity")) df
    else {
      val d = df.withColumn("cogs", col("last_cost") * col("quantity"))
      if (!d.columns.contains("total_line_price")) d
      else d
        .withColumn("gross_margin", col("total_line_price") - col("cogs"))
        .withColumn("gm_pct",
          when(abs(col("total_line_price")) > 1e-9,
            col("gross_margin") / col("total_line_price")))
    }

  /** P11 — quality flags (`Project.py:149-155`), non-null booleans. */
  def withQualityFlags(df: DataFrame): DataFrame = {
    val d1 =
      if (has(df, "quantity"))
        df.withColumn("flag_negative_qty",
          coalesce(col("quantity") < 0, lit(false)))
      else df.withColumn("flag_negative_qty", lit(false))
    val d2 =
      if (has(d1, "total_line_price"))
        d1.withColumn("flag_negative_price",
          coalesce(col("total_line_price") < 0, lit(false)))
      else d1.withColumn("flag_negative_price", lit(false))
    if (has(d2, "total_line_price", "quantity"))
      d2.withColumn("flag_zero_price_nonzero_qty",
        coalesce(col("quantity"), lit(0.0)) =!= 0 &&
        coalesce(col("total_line_price"), lit(0.0)) === 0)
    else d2.withColumn("flag_zero_price_nonzero_qty", lit(false))
  }

  def withAll(df: DataFrame): DataFrame =
    withQualityFlags(withMargins(withAsp(df)))
}
