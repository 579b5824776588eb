package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Benford audit: exact-decimal digit extraction, exclusions, the
  * zero-digit scaffold, and share conservation.
  */
class BenfordSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("first significant digits come from the exact decimal form") {
    val vals = Seq(Some(123.45), Some(0.45), Some(9.99), Some(0.004),
      Some(-5.0), Option.empty[Double]).toDF("v")
    val r = Validation.benford(vals, "v").collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    // sub-cent amounts still read their true digit; -5 and null excluded
    assert(r(1) == 1L && r(4) == 2L && r(9) == 1L)
    assert(r.values.sum == 4L)
  }

  test("digit survives >2-dp inputs and cents-carry boundaries") {
    // the cents-scaling form misread all of these: 0.095 carried to
    // cents 10 (digit 1, not 9); 9.9996 carried to 1000 (digit 1, not
    // 9); 0.00042 has no cent at all but its first digit is 4
    val vals = Seq(0.095, 9.9996, 0.00042, 1234.5678).toDF("v")
    val r = Validation.benford(vals, "v").collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r(9) == 2L && r(4) == 1L && r(1) == 1L)
    assert(r.values.sum == 4L)
    // below the 6-dp decimal floor there is no significant digit left
    val tiny = Seq(0.0000004).toDF("v")
    assert(Validation.benford(tiny, "v").collect()
      .map(_.getLong(1)).sum == 0L)
  }

  test("scaffold surfaces zero-count digits; shares conserve") {
    val ones = Seq.fill(10)(100.0).toDF("v")
    val rows = Validation.benford(ones, "v").collect()
    assert(rows.length == 9, "all nine digits report")
    val byDigit = rows.map(x => x.getInt(0) -> x).toMap
    assert(byDigit(1).getLong(1) == 10L)
    assert(byDigit(1).getDouble(2) == 1.0)
    (2 to 9).foreach { d =>
      assert(byDigit(d).getLong(1) == 0L)
      assert(byDigit(d).getDouble(2) == 0.0)
      assert(byDigit(d).getDouble(4) > 0.0, "missing digits add chi2")
    }
    // expected shares are Benford's law at 9 dp
    assert(byDigit(1).getDouble(3) == 0.301029996)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-6)
  }
}
