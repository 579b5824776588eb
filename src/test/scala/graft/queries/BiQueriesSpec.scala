package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Inline-frame tests for the BI aggregations — the deterministic
  * tie-break and guard semantics the oracle relies on (FIXTURES.md §3).
  */
class BiQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Q2 top-k ties at the cutoff break on product_desc ASC") {
    // three products, two tied — k=2 must keep the lexicographically
    // smaller of the tied pair
    val df = Seq(
      ("2024-01", "apple", 10.0), ("2024-01", "banana", 10.0),
      ("2024-01", "cherry", 99.0)
    ).toDF("fin_month_label", "product_desc", "total_line_price")
    val got = BiQueries.topProducts(df, k = 2).collect().map(_.getString(0))
    assert(got.toSeq == Seq("cherry", "apple"))
  }

  test("Q1 one-pass equals Q1b join form") {
    val df = Seq(
      ("2024-01", 10.0, 2.0), ("2024-01", 20.0, 4.0), ("2024-02", 5.0, 1.0)
    ).toDF("fin_month_label", "total_line_price", "gross_margin")
    val a = BiQueries.revenueByMonth(df).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    val b = BiQueries.revenueByMonthJoined(df).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(a == b)
    assert(a.contains(("2024-01", 30.0, 6.0, 0.2)))
  }

  test("Q1 gm_pct guard: zero-revenue group yields null, not NaN/inf") {
    val df = Seq(("2024-01", 5.0, 1.0), ("2024-01", -5.0, 1.0))
      .toDF("fin_month_label", "total_line_price", "gross_margin")
    val r = BiQueries.revenueByMonth(df).head()
    assert(r.isNullAt(r.fieldIndex("gm_pct")))
  }

  test("Q5 flag counts are conditional sums") {
    val df = Seq(
      ("2024-01", Some(1.0), true, false, false),
      ("2024-01", Some(2.0), true, true, false),
      ("2024-02", None: Option[Double], false, false, false)
    ).toDF("fin_month_label", "total_line_price", "flag_negative_qty",
      "flag_negative_price", "flag_zero_price_nonzero_qty")
      .withColumn("event_date",
        org.apache.spark.sql.functions.lit("2024-01-05").cast("timestamp"))
    val r = BiQueries.summary(df).head()
    assert(r.getLong(r.fieldIndex("total_rows")) == 3L)
    assert(r.getLong(r.fieldIndex("neg_qty_rows")) == 2L)
    assert(r.getLong(r.fieldIndex("neg_price_rows")) == 1L)
    assert(r.getLong(r.fieldIndex("zero_price_rows")) == 0L)
    assert(r.getLong(r.fieldIndex("fin_months")) == 2L)
  }
}
