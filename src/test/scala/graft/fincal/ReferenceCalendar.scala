package graft.fincal

import java.time.{DayOfWeek, LocalDate, YearMonth}

/** Direct Scala port of the reference's fiscal-calendar functions
  * (`/root/reference/Project.py:69-96`) — the executable spec the Spark
  * expressions are tested against (SURVEY §5.3). Ported literally,
  * including the overlapping-bounds quirk; NOT used by production code.
  */
object ReferenceCalendar {

  /** `Project.py:69-70` — calendar.monthrange last day. */
  def lastDayOfMonth(y: Int, m: Int): LocalDate = YearMonth.of(y, m).atEndOfMonth()

  /** `Project.py:72-76` — walk back from the last day to weekday `wd`. */
  def lastWeekdayOfMonth(y: Int, m: Int, wd: DayOfWeek): LocalDate = {
    var d = lastDayOfMonth(y, m)
    while (d.getDayOfWeek != wd) d = d.minusDays(1)
    d
  }

  def lastFriday(y: Int, m: Int): LocalDate = lastWeekdayOfMonth(y, m, DayOfWeek.FRIDAY)
  def lastSaturday(y: Int, m: Int): LocalDate = lastWeekdayOfMonth(y, m, DayOfWeek.SATURDAY)

  /** `Project.py:84-88` — financial (year, month) with Dec→Jan rollover. */
  def financialMonth(d: LocalDate): (Int, Int) = {
    val lf = lastFriday(d.getYear, d.getMonthValue)
    if (!d.isAfter(lf)) (d.getYear, d.getMonthValue)
    else if (d.getMonthValue == 12) (d.getYear + 1, 1)
    else (d.getYear, d.getMonthValue + 1)
  }

  /** `Project.py:114` — `f"{y}-{m:02d}"`. */
  def label(d: LocalDate): String = {
    val (y, m) = financialMonth(d)
    f"$y%04d-$m%02d"
  }

  /** `Project.py:90-92` — (last Saturday of prev month, last Friday). */
  def bounds(y: Int, m: Int): (LocalDate, LocalDate) = {
    val (py, pm) = if (m == 1) (y - 1, 12) else (y, m - 1)
    (lastSaturday(py, pm), lastFriday(y, m))
  }

  /** `Project.py:94-96` — `"FY{y} Q{q}"`, q = (m-1)//3+1. */
  def quarterLabel(y: Int, m: Int): String = s"FY$y Q${(m - 1) / 3 + 1}"
}
