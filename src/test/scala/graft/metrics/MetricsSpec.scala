package graft.metrics

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Null-parity fixtures for P8-P11 (`/root/reference/Project.py:128-155`):
  * pandas NaN-comparisons are False (flags non-null), guarded ratios null.
  */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame = Seq(
    // (id, quantity, total_line_price, last_cost)
    (1, Some(2.0), Some(10.0), Some(3.0)),   // normal
    (2, Some(0.0), Some(10.0), Some(3.0)),   // zero qty → asp null
    (3, None: Option[Double], Some(10.0), Some(3.0)), // null qty
    (4, Some(2.0), Some(0.0), Some(3.0)),    // zero price → gm_pct null, flag
    (5, Some(-1.0), Some(-5.0), None)        // negatives, null cost
  ).toDF("id", "quantity", "total_line_price", "last_cost")

  test("P8 asp: fillna(0)!=0 guard → null on zero or null qty") {
    val got = Metrics.withAsp(frame).collect().sortBy(_.getInt(0))
      .map(r => Option(r.get(r.fieldIndex("asp"))))
    assert(got(0).contains(5.0))
    assert(got(1).isEmpty)
    assert(got(2).isEmpty)
  }

  test("P10 gm_pct: abs(price)>1e-9 guard → null on zero price") {
    val got = Metrics.withMargins(Metrics.withAsp(frame)).collect()
      .sortBy(_.getInt(0)).map(r => Option(r.get(r.fieldIndex("gm_pct"))))
    assert(got(0).contains((10.0 - 6.0) / 10.0))
    assert(got(3).isEmpty)
  }

  test("P9 cogs/gross_margin null-propagate") {
    val r5 = Metrics.withAll(frame).filter("id = 5").head()
    assert(r5.isNullAt(r5.fieldIndex("cogs")))         // null cost
    assert(r5.isNullAt(r5.fieldIndex("gross_margin")))
  }

  test("P11 flags are NON-NULL booleans even on null inputs (pandas NaN<0 = False)") {
    val rows = Metrics.withAll(frame).collect().sortBy(_.getInt(0))
    def flag(r: org.apache.spark.sql.Row, c: String) = r.getBoolean(r.fieldIndex(c))
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("flag_negative_qty")))
      assert(!r.isNullAt(r.fieldIndex("flag_negative_price")))
      assert(!r.isNullAt(r.fieldIndex("flag_zero_price_nonzero_qty")))
    }
    assert(!flag(rows(2), "flag_negative_qty"))       // null qty → false
    assert(flag(rows(4), "flag_negative_qty"))
    assert(flag(rows(4), "flag_negative_price"))
    assert(flag(rows(3), "flag_zero_price_nonzero_qty"))
    assert(!flag(rows(1), "flag_zero_price_nonzero_qty")) // zero qty → false
  }
}
