package graft.ext

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** RFM segmentation: quintile scores on a hand-built ladder, the
  * inverted recency convention, segment naming, input hygiene.
  */
class RfmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")

  // customer i places i orders, most recent on 2024-01-0i, spending
  // 100*i each: every metric ranks customers 1 < 2 < 3 < 4 < 5
  private def orders = (1 to 5).flatMap { i =>
    (1 to i).map(j => (Some(i.toLong), ts(f"2024-01-0$i"), 100.0 * i))
  }.toDF("cust", "d", "amt")

  test("all three quintile scores rank the hand-built ladder 1..5") {
    val r = Features.rfmSegments(orders, "cust", "d", "amt")
      .collect().map(x => x.getLong(0) ->
        (x.getInt(4), x.getInt(5), x.getInt(6), x.getString(7))).toMap
    assert(r.size == 5)
    for (i <- 1 to 5) {
      val (rs, fs, ms, _) = r(i.toLong)
      assert(fs == i, s"f_score of cust $i")
      assert(ms == i, s"m_score of cust $i")
      // recency inverted: newest (cust 5, recency 0) scores 5
      assert(rs == i, s"r_score of cust $i")
    }
    assert(r(5L)._4 == "champion")
    assert(r(1L)._4 == "hibernating")
  }

  test("segment ladder: loyal beats big_spender beats at_risk in order") {
    // craft scores via a frame where one customer is frequent but not
    // recent/rich enough to be champion: freq high, amounts tiny
    val mixed = ((1 to 4).flatMap { i =>
      (1 to i).map(_ => (i.toLong, ts(f"2024-01-0$i"), 100.0 * i))
    } ++ (1 to 10).map(_ => (9L, ts("2024-01-01"), 1.0)))
      .toDF("cust", "d", "amt")
    val seg = Features.rfmSegments(mixed, "cust", "d", "amt")
      .collect().map(x => x.getLong(0) -> x.getString(7)).toMap
    // cust 9: top frequency quintile, bottom recency -> loyal (f>=4
    // wins before at_risk in the ladder)
    assert(seg(9L) == "loyal")
  }

  test("null customer keys are dropped, not scored as a class") {
    val withNull = orders.unionAll(
      Seq((Option.empty[Long], ts("2024-01-05"), 5.0))
        .toDF("cust", "d", "amt"))
    val r = Features.rfmSegments(withNull, "cust", "d", "amt")
    assert(r.filter(r("cust").isNull).collect().isEmpty)
    assert(r.count() == 5)
  }
}
