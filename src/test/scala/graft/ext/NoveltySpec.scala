package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** t76 novelty score: hand-traced shares against a tiny reference,
  * the distinct-per-doc rule (a repeated novel phrase is not counted
  * twice), and the verdict bands.
  */
class NoveltySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def noveltyOf(batch: Seq[(Long, String)],
                        ref: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, String)] =
    TextAnalysis.noveltyScore(batch.toDF("doc_id", "text"),
        ref.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap

  test("hand-traced shares and verdict bands") {
    val ref = Seq((10L, "a b c x"))  // ref shingles: "a b c", "b c x"
    val batch = Seq(
      (1L, "a b c d"),        // "a b c" seen, "b c d" novel -> 1/2
      (2L, "p q r"),          // one shingle, novel -> 1/1
      (3L, "a b c x"))        // both seen -> 0/2
    val got = noveltyOf(batch, ref)
    assert(got == Map(
      1L -> ((2L, 1L, 500000000L, "mixed")),
      2L -> ((1L, 1L, 1000000000L, "novel")),
      3L -> ((2L, 0L, 0L, "redundant"))), s"got $got")
  }

  test("a repeated novel phrase scores once — the distinct-per-doc " +
    "rule") {
    // "p q r p q r": 4 shingle positions but 3 DISTINCT shingles
    val got = noveltyOf(Seq((1L, "p q r p q r")), Seq((10L, "z z z")))
    assert(got(1L) == ((3L, 3L, 1000000000L, "novel")), s"got $got")
  }

  test("empty batch and empty reference are safe") {
    assert(noveltyOf(Seq.empty, Seq((10L, "a b c"))).isEmpty)
    // empty reference: everything is novel, never a crash
    val got = noveltyOf(Seq((1L, "a b c")), Seq.empty)
    assert(got(1L) == ((1L, 1L, 1000000000L, "novel")), s"got $got")
  }
}
