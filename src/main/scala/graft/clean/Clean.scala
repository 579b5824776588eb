package graft.clean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, TimestampType}

/** Cleaning operators (SURVEY §2.2 P3–P6), pandas-parity null semantics.
  *
  * All of these require `spark.sql.ansi.enabled=false` so that failed casts
  * coerce to null exactly like `pd.to_numeric(errors="coerce")` /
  * `pd.to_datetime(errors="coerce")` (`/root/reference/Project.py:47-55`).
  */
object Clean {

  /** P3 — string cleanup + null-literal normalization
    * (`Project.py:37-38`): trim every string column, then exact-match
    * replace `"nan"/"None"/"null"` with null. Case-sensitive, post-trim,
    * matching the reference's `.str.strip().replace({...})` order.
    */
  val NullLiterals: Seq[String] = Seq("nan", "None", "null")

  def normalizeStrings(df: DataFrame): DataFrame = {
    val exprs = df.schema.fields.map { f =>
      if (f.dataType == StringType) {
        val t = trim(col(f.name))
        when(t.isin(NullLiterals: _*), lit(null)).otherwise(t).as(f.name)
      } else col(f.name)
    }
    df.select(exprs.toIndexedSeq: _*)
  }

  /** P4 — the reference's fixed numeric column list (`Project.py:41-45`). */
  val NumericColumns: Seq[String] = Seq(
    "total_due", "amt_current", "amt_30_days", "amt_60_days", "amt_90_days",
    "amt_120_days", "amt_150_days", "amt_180_days", "amt_210_days",
    "amt_240_days", "quantity", "total_line_price", "last_cost",
    "tot_payment", "bank_amt", "transtype_code")

  /** P4 — coercing numeric cast (`Project.py:47-49`); non-ANSI
    * `cast(double)` ≡ `pd.to_numeric(errors="coerce")`. Only columns present
    * in the schema are touched, like the reference's `if c in df.columns`.
    */
  def castNumerics(df: DataFrame, cols: Seq[String] = NumericColumns): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(c, col(c).cast(DoubleType))
    }

  /** P5 — the reference's date column list (`Project.py:53`). */
  val DateColumns: Seq[String] = Seq("trans_date", "deposit_date")

  /** P5 — coercing timestamp parse (`Project.py:53-55`); non-ANSI
    * `to_timestamp` returns null on unparseable input like
    * `pd.to_datetime(errors="coerce")`.
    */
  def parseDates(df: DataFrame, cols: Seq[String] = DateColumns): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(c, to_timestamp(col(c)))
    }

  /** P6 — `event_date` fallback (`Project.py:58-64`). COLUMN-level, not
    * per-row `coalesce`: if `trans_date` exists as a column it is used
    * wholesale (a row with null trans_date but non-null deposit_date still
    * gets null). Reproduced as a driver-side schema decision.
    */
  def withEventDate(df: DataFrame): DataFrame =
    if (df.columns.contains("trans_date"))
      df.withColumn("event_date", col("trans_date"))
    else if (df.columns.contains("deposit_date"))
      df.withColumn("event_date", col("deposit_date"))
    else
      df.withColumn("event_date", lit(null).cast(TimestampType))
}
