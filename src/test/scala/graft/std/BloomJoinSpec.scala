package graft.std

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bloom-pruned join: exactness vs the plain join, the pre-join prune,
  * null-key and type-mismatch contracts.
  */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bloom join equals the plain join; the prefilter actually cuts") {
    // spark.range, not toDF: a LocalRelation probe would be folded by
    // ConvertToLocalRelation and leave no Filter node to assert on
    val probe = spark.range(1L, 1001L).select(col("id").as("k"),
      concat(lit("p"), col("id")).as("payload"))
    val build = Seq((7L, "a"), (500L, "b"), (999L, "c"), (7L, "dup"))
      .toDF("bk", "tag")
    val got = BloomJoin.bloomPrunedJoin(probe, build, "k", "bk")
      .select("k", "payload", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = probe.join(build, col("k") === col("bk"))
      .select("k", "payload", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == want && want.size == 4) // 7 matches twice
    // the bloom filter sits in the plan as a pre-join graft probe
    val frame = BloomJoin.bloomPrunedJoin(probe, build, "k", "bk")
    frame.collect()
    val hasProbe = graft.std.Plans.collect(frame) {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition
          .find(_.isInstanceOf[graft.functions.BloomContains]).isDefined => f
    }.nonEmpty
    assert(hasProbe, "bloom membership probe missing from the plan")
  }

  test("null probe keys drop, matching inner-join semantics") {
    val probe = Seq[(java.lang.Long, String)]((1L, "x"), (null, "n"))
      .toDF("k", "payload")
    val build = Seq((1L, "a")).toDF("bk", "tag")
    val got = BloomJoin.bloomPrunedJoin(probe, build, "k", "bk").collect()
    assert(got.length == 1 && got.head.getString(1) == "x")
  }

  test("cross-type keys are a loud error, not silent missed matches") {
    val probe = Seq((5.0, "x")).toDF("k", "payload")
    val build = Seq((5L, "a")).toDF("bk", "tag")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomPrunedJoin(probe, build, "k", "bk")
    }
    assert(e.getMessage.contains("share a type"))
  }
}
