package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Association rules: hand-computed metrics, the Apriori cut, input
  * hygiene.
  */
class BasketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def baskets = Seq(
    (1L, 10L), (1L, 20L), (1L, 30L),
    (2L, 10L), (2L, 20L),
    (3L, 10L), (3L, 30L),
    (4L, 10L)).toDF("b", "i")

  test("support, confidence and lift match the hand computation") {
    val r = Basket.associationRules(baskets, "b", "i",
        minItemCount = 1L, minPairCount = 1L)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    assert(r.size == 3)
    val ab = r((10L, 20L)) // n_a=4, n_b=2, n_ab=2, N=4
    assert(ab.getLong(4) == 2L)
    assert(ab.getLong(5) == 500000000L, "support = 2/4")
    assert(ab.getLong(7) == 500000000L, "conf 10->20 = 2/4")
    assert(ab.getLong(9) == 1000000000L, "conf 20->10 = 2/2")
    assert(ab.getLong(11) == 1000000000L, "lift = 2*4/(4*2) = 1")
    val bc = r((20L, 30L)) // co-occur once, in basket 1 only
    assert(bc.getLong(4) == 1L)
    assert(bc.getLong(5) == 250000000L, "support = 1/4")
    assert(bc.getLong(11) == 1000000000L, "lift = 1*4/(2*2) = 1")
  }

  test("Apriori cut: infrequent items never reach pair generation") {
    // minItemCount=3 keeps only item 10 -> no pair survives
    val r = Basket.associationRules(baskets, "b", "i",
      minItemCount = 3L, minPairCount = 1L)
    assert(r.collect().isEmpty)
    // minPairCount=2 drops the single-co-occurrence (20,30) pair
    val r2 = Basket.associationRules(baskets, "b", "i",
        minItemCount = 1L, minPairCount = 2L)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r2 == Set((10L, 20L), (10L, 30L)))
  }

  test("duplicate lines in a basket collapse; empty input stays empty") {
    val dup = baskets.unionAll(Seq((1L, 10L), (1L, 10L)).toDF("b", "i"))
    val r = Basket.associationRules(dup, "b", "i", 1L, 1L)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(4))
      .toMap
    assert(r((10L, 20L)) == 2L, "duplicate (1,10) rows must not inflate")
    val empty = Seq.empty[(Long, Long)].toDF("b", "i")
    val er = Basket.associationRules(empty, "b", "i", 1L, 1L)
    assert(er.collect().isEmpty)
    assert(er.columns.toSeq == Seq("item_a", "item_b", "n_a", "n_b",
      "n_ab", "support_e9", "support", "conf_ab_e9", "conf_ab",
      "conf_ba_e9", "conf_ba", "lift_e9", "lift"))
  }
}
