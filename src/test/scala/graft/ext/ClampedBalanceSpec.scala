package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Clamped balance: the reflection closed form against a literal
  * sequential fold, clamp engagement, key isolation.
  */
class ClampedBalanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("window closed form equals the sequential max(0, prev + d) fold") {
    val deltas = (1 to 200).map { i =>
      val key = (i % 5).toLong
      val d = ((i * 37 % 21) - 10).toDouble // mix of +/- deltas
      (key, i.toLong, d)
    }
    val expected = deltas.groupBy(_._1).flatMap { case (k, rows) =>
      var b = 0.0
      rows.sortBy(_._2).map { case (_, seq, d) =>
        b = math.max(0.0, b + d); (k, seq) -> b
      }
    }
    val r = Timeseries.clampedBalance(
        deltas.toDF("k", "seq", "delta"), "k", Seq("seq"), "delta")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(3))
      .toMap
    assert(r.size == 200)
    expected.foreach { case (key, b) =>
      assert(r(key) == b, s"divergence at $key")
    }
  }

  test("the clamp actually engages: drain below zero, then refill") {
    val r = Timeseries.clampedBalance(
        Seq((1L, 1L, 5.0), (1L, 2L, -9.0), (1L, 3L, 4.0))
          .toDF("k", "seq", "delta"), "k", Seq("seq"), "delta")
      .collect().sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
    // plain running sum would give 5, -4, 0; the clamp holds at 0
    assert(r == Seq(5.0, 0.0, 4.0))
  }
}
