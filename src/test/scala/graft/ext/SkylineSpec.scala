package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Skyline: hand-verified dominance, duplicates, nulls, and the
  * two-level prefix max against a brute-force reference.
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand case: exactly the undominated points survive") {
    // (id, price to minimize, size to maximize)
    val pts = Seq(
      (1L, 1.0, 5), (2L, 2.0, 7), (3L, 2.0, 6), (4L, 3.0, 7),
      (5L, 0.5, 1)).toDF("id", "price", "size")
    val r = Skyline.paretoFront(pts, "price", "size",
      m => floor(m)).select("id").as[Long].collect().toSet
    // 3 loses to 2 (same price, bigger size); 4 loses to 2 (cheaper,
    // size ties); 1, 2, 5 trade off
    assert(r == Set(1L, 2L, 5L))
  }

  test("duplicate points survive together; nulls are excluded") {
    val pts = Seq(
      (1L, Some(1.0), Some(5)), (2L, Some(1.0), Some(5)),
      (3L, None, Some(9)), (4L, Some(0.1), None))
      .toDF("id", "price", "size")
    val r = Skyline.paretoFront(pts, "price", "size",
      m => floor(m)).select("id").as[Long].collect().toSet
    assert(r == Set(1L, 2L))
  }

  test("two-level prefix max equals brute-force dominance on a dense set") {
    // deterministic pseudo-random points spread across many buckets
    val pts = (1 to 400).map { i =>
      val price = (i * 37 % 97).toDouble + (i % 7) * 0.125
      val size = i * 53 % 89
      (i.toLong, price, size)
    }
    val expected = pts.filter { case (_, p, s) =>
      !pts.exists { case (_, p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s)
      }
    }.map(_._1).toSet
    val r = Skyline.paretoFront(pts.toDF("id", "price", "size"),
        "price", "size", m => floor(m / lit(10.0)))
      .select("id").as[Long].collect().toSet
    assert(r == expected)
  }
}
