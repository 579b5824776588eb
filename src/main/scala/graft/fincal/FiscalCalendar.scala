package graft.fincal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The reference's financial calendar (SURVEY §2.4;
  * `/root/reference/Project.py:69-126`) as pure Catalyst `Column`
  * expressions — the reference computes these in an O(rows) interpreted
  * Python loop (`Project.py:110-119`); here they are vectorized,
  * codegen-able expressions with no UDF.
  *
  * Semantics (reproduced exactly, including the documented quirk):
  *  - a financial month ends on the **last Friday** of its calendar month
  *    (`Project.py:78-79,84-88`);
  *  - a date after its month's last Friday rolls into the next financial
  *    month, December rolling into `(year+1, 1)` (`Project.py:88`);
  *  - the financial month's start bound is the **last Saturday of the
  *    previous calendar month** (`Project.py:90-92`) — usually the day
  *    after the previous month's last Friday but NOT always (months ending
  *    on a Friday have their last Saturday 6 days earlier, so bounds can
  *    overlap). Reproduced as written, not "fixed".
  *  - comparisons are at DAY granularity: the reference calls `.date()`
  *    before comparing (`Project.py:112`), hence `to_date` here.
  *
  * Spark `dayofweek` is Sunday=1 … Saturday=7.
  */
object FiscalCalendar {

  /** C2/C3 — last Friday of the calendar month containing date `d`. */
  def lastFriday(d: Column): Column = {
    val ld = last_day(d)
    date_sub(ld, (dayofweek(ld) + lit(1)) % 7)
  }

  /** C2/C3 — last Saturday of the calendar month containing date `d`. */
  def lastSaturday(d: Column): Column = {
    val ld = last_day(d)
    date_sub(ld, dayofweek(ld) % 7)
  }

  /** C4 — the financial month of a timestamp/date, represented as the
    * first-of-month DATE (so year/month/label all derive from one value;
    * `add_months` handles the December→January rollover for free).
    */
  def finMonthDate(ts: Column): Column = {
    val d = to_date(ts)
    val som = trunc(d, "MM")
    when(d <= lastFriday(d), som).otherwise(add_months(som, 1))
  }

  /** `"YYYY-MM"` label (`Project.py:114`); null for null dates. */
  def finMonthLabel(fm: Column): Column = date_format(fm, "yyyy-MM")

  /** The `astype(str)` parity form (`Project.py:124`): dateless rows get
    * the literal string `"None"`, which then forms a real group in every
    * label-keyed aggregate.
    */
  def finMonthLabelStr(fm: Column): Column =
    coalesce(finMonthLabel(fm), lit("None"))

  /** C5 — start bound: last Saturday of the *previous* calendar month. */
  def finMonthStart(fm: Column): Column = lastSaturday(add_months(fm, -1))

  /** C5 — end bound: last Friday of the financial month itself. */
  def finMonthEnd(fm: Column): Column = lastFriday(fm)

  /** Cast to long so the DuckDB oracle's BIGINT `year()` schema matches. */
  def finYear(fm: Column): Column = year(fm).cast(LongType)

  def finMonthNum(fm: Column): Column = month(fm).cast(LongType)

  /** C6 — `"FY{y} Q{q}"`, quarter of the *financial* month
    * (`Project.py:94-96`); built-in `quarter()` is exactly `(m-1)//3+1`.
    */
  def finQuarter(fm: Column): Column =
    when(fm.isNotNull, format_string("FY%d Q%d", year(fm), quarter(fm)))

  /** The reference's phantom `fin_week_label` (`Project.py:371,391` — never
    * created there; SURVEY §1.2). Defined here as the 1-based Saturday→Friday
    * week within the financial month, counted from `fin_month_start`.
    * Excluded from reference-parity oracles; oracled under our own
    * definition.
    */
  def finWeekLabel(ts: Column): Column = {
    val fm = finMonthDate(ts)
    val week =
      (floor(datediff(to_date(ts), finMonthStart(fm)).cast("double") / 7.0) + 1)
        .cast("int")
    when(fm.isNotNull, concat(finMonthLabel(fm), lit("-W"), week))
  }

  /** C7 — attach all financial-calendar columns (the reference's row loop,
    * `Project.py:98-126`, as one vectorized projection).
    */
  def withFinCalendar(df: DataFrame, dateCol: String = "event_date"): DataFrame = {
    val fm = finMonthDate(col(dateCol))
    df.withColumns(Map(
      "fin_month_label" -> finMonthLabelStr(fm),
      "fin_month_start" -> finMonthStart(fm),
      "fin_month_end"   -> finMonthEnd(fm),
      "fin_year"        -> finYear(fm),
      "fin_month_num"   -> finMonthNum(fm),
      "fin_quarter"     -> finQuarter(fm),
      "fin_week_label"  -> finWeekLabel(col(dateCol))
    ))
  }
}
