package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CCNet perplexity buckets (t62): tertile split, bucket semantics
  * (head = most probable), per-source shares, exclusions.
  */
class PerplexityBucketsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("nine distinct scores split 3/3/3 and head is the most probable") {
    // common tokens score high (head); each tier adds rarer tokens so
    // the nine avg logprobs are distinct and strictly ordered
    val docs = (0 until 9).map { i =>
      val tier = i / 3 // 0 = common, 1 = mixed, 2 = rare
      val text = tier match {
        case 0 => "the the the the"
        case 1 => s"the the mid$i mid$i"
        case _ => s"rare${i}a rare${i}b rare${i}c rare${i}d"
      }
      (i.toLong, "src", text)
    }.toDF("doc_id", "source", "text")
    val r = TextAnalysis.perplexityBuckets(docs).collect()
      .map(x => x.getString(1) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    graft.std.Materialize.releaseAll()
    assert(r.keySet == Set("head", "middle", "tail"))
    assert(r("head")._1 == 3L && r("middle")._1 == 3L && r("tail")._1 == 3L)
    // shares sum to 1 within the source (6-dp rounding: thirds sum
    // to 0.999999, not 1.0)
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 2e-6)
    // head = highest avg logprob (lowest perplexity), tail = lowest
    assert(r("head")._3 > r("middle")._3 &&
      r("middle")._3 > r("tail")._3)
  }

  test("shares are per SOURCE; empty docs score via the '' pseudo-token") {
    val docs = Seq(
      (1L, "a", "the the the"), (2L, "a", "the the zzq"),
      (3L, "b", "the the the"), (4L, "b", "qqz qqz wxv"),
      (5L, "b", ""), (6L, "b", "   ")) // t25 contract: one "" token
      .toDF("doc_id", "source", "text")
    val rows = TextAnalysis.perplexityBuckets(docs).collect()
    graft.std.Materialize.releaseAll()
    val bySrc = rows.groupBy(_.getString(0))
    // every doc lands in exactly one bucket — including the empties
    assert(bySrc("b").map(_.getLong(2)).sum == 4L)
    assert(bySrc("a").map(_.getLong(2)).sum == 2L)
    bySrc.values.foreach { rs =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 2e-6,
        "per-source shares must sum to 1 (6-dp rounding grain)")
    }
  }
}
