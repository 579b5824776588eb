package graft.fincal

import java.time.{DayOfWeek, LocalDate}

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property spec for the fiscal-calendar invariants (SURVEY
  * §5.3) against the reference port — random dates over 1900–2200, wider
  * than the exhaustive differential's 1990–2100 window. The *actual*
  * invariants, not the tempting-but-false one: `d ∈ (start, end]` does
  * NOT hold in general (the overlapping-bounds quirk, SURVEY §2.4).
  */
object FiscalCalendarPropSpec extends Properties("ReferenceCalendar") {

  private val genDate: Gen[LocalDate] = for {
    epochDay <- Gen.choose(
      LocalDate.of(1900, 1, 1).toEpochDay,
      LocalDate.of(2200, 12, 31).toEpochDay)
  } yield LocalDate.ofEpochDay(epochDay)

  property("fin month is the date's month or the next (Dec wraps to Jan)") =
    Prop.forAll(genDate) { d =>
      val (fy, fm) = ReferenceCalendar.financialMonth(d)
      val sameMonth = fy == d.getYear && fm == d.getMonthValue
      val nextMonth =
        if (d.getMonthValue == 12) fy == d.getYear + 1 && fm == 1
        else fy == d.getYear && fm == d.getMonthValue + 1
      sameMonth || nextMonth
    }

  property("end bound is the last Friday of the fin month") =
    Prop.forAll(genDate) { d =>
      val (fy, fm) = ReferenceCalendar.financialMonth(d)
      val (_, end) = ReferenceCalendar.bounds(fy, fm)
      end.getDayOfWeek == DayOfWeek.FRIDAY &&
        end.getMonthValue == fm && end.getYear == fy &&
        end.plusDays(7).getMonthValue != fm
    }

  property("start bound is the last Saturday of the previous calendar month") =
    Prop.forAll(genDate) { d =>
      val (fy, fm) = ReferenceCalendar.financialMonth(d)
      val (start, _) = ReferenceCalendar.bounds(fy, fm)
      val (py, pm) = if (fm == 1) (fy - 1, 12) else (fy, fm - 1)
      start.getDayOfWeek == DayOfWeek.SATURDAY &&
        start.getMonthValue == pm && start.getYear == py &&
        start.plusDays(7).getMonthValue != pm
    }

  property("a date is never after its fin month's end bound") =
    Prop.forAll(genDate) { d =>
      val (fy, fm) = ReferenceCalendar.financialMonth(d)
      val (_, end) = ReferenceCalendar.bounds(fy, fm)
      !d.isAfter(end)
    }

  property("label formats as zero-padded YYYY-MM") =
    Prop.forAll(genDate) { d =>
      ReferenceCalendar.label(d).matches("""\d{4}-\d{2}""")
    }

  property("quarter is (m-1)/3+1 of the fin month") =
    Prop.forAll(genDate) { d =>
      val (fy, fm) = ReferenceCalendar.financialMonth(d)
      ReferenceCalendar.quarterLabel(fy, fm) == s"FY$fy Q${(fm - 1) / 3 + 1}"
    }
}
