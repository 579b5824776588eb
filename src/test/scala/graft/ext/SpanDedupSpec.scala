package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** t77 sliding-span exact-substring dedup: hand-traced island
  * arithmetic — unaligned cross-doc recurrence (the case t28's fixed
  * segment grid cannot express), overlap merge, the exact boundary
  * merge rule (off <= prev + L merges, off = prev + L + 1 breaks),
  * within-doc repetition, and the every-doc-survives contract.
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], l: Int = 8)
      : Map[Long, (String, Long, Long, Long)] =
    TextAnalysis.spanDedup(docs.toDF("doc_id", "text"), minTokens = l)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(prefix + _).mkString(" ")

  test("unaligned recurring span: caught at any offset, overlaps merge") {
    // a 10-token run shared by two docs at DIFFERENT offsets (4 and 6)
    // — misaligned to any fixed 8-token segment grid. It opens 3
    // overlapping duplicated windows per doc; the island merge must
    // collapse them to ONE removed span covering exactly the 10 tokens.
    val shared = toks("s", 10)
    val got = run(Seq(
      (1L, s"p1 p2 p3 $shared a1 a2"),
      (2L, s"q1 q2 q3 q4 q5 $shared")))
    assert(got(1L) == (("p1 p2 p3 a1 a2", 15L, 1L, 10L)), s"got $got")
    assert(got(2L) == (("q1 q2 q3 q4 q5", 15L, 1L, 10L)), s"got $got")
  }

  test("within-doc repetition counts; gap > L breaks islands") {
    // the same 8-token run twice inside ONE doc (offsets 1 and 10,
    // 10 > 1 + 8): two islands, the middle token survives
    val r = toks("r", 8)
    val got = run(Seq((1L, s"$r gap $r")))
    assert(got(1L) == (("gap", 17L, 2L, 16L)), s"got $got")
  }

  test("boundary merge: adjacent coverage (off = prev + L) is one span") {
    // doc 1 = R T, doc 2 = T R: R dups at offsets (1, 9), T at (9, 1);
    // the boundary-crossing windows mix R and T tokens in different
    // orders so they are unique. Dup offsets {1, 9} with 9 <= 1 + 8
    // merge: ONE island covering the whole 16 tokens in each doc.
    val r = toks("r", 8); val t = toks("t", 8)
    val got = run(Seq((1L, s"$r $t"), (2L, s"$t $r")))
    assert(got(1L) == (("", 16L, 1L, 16L)), s"got $got")
    assert(got(2L) == (("", 16L, 1L, 16L)), s"got $got")
  }

  test("docs shorter than L never dup; clean docs untouched") {
    val got = run(Seq(
      (1L, "tiny identical doc here now"),
      (2L, "tiny identical doc here now"),   // exact dup, but < 8 tokens
      (3L, toks("u", 12))))                  // unique 12-token doc
    assert(got(1L) == (("tiny identical doc here now", 5L, 0L, 0L)))
    assert(got(2L) == (("tiny identical doc here now", 5L, 0L, 0L)))
    assert(got(3L) == ((toks("u", 12), 12L, 0L, 0L)), s"got $got")
  }

  test("null text survives as the empty doc, never a dropped row") {
    val got = run(Seq((1L, null), (2L, toks("v", 9))))
    // '' tokenizes to one empty token (the t28 rule)
    assert(got(1L) == (("", 1L, 0L, 0L)), s"got $got")
    assert(got.keySet == Set(1L, 2L))
  }

  test("t78 rollup: chrome feed reads chrome_heavy, clean feed clean, " +
    "shares are exact fixed point") {
    // feed A: two docs sharing a 10-token run (10 of 15 tokens dup per
    // doc → share 666666666, chrome_heavy); feed B: unique docs
    val shared = toks("s", 10)
    val docs = Seq(
      (1L, "a", s"p1 p2 p3 $shared a1 a2"),
      (2L, "a", s"q1 q2 q3 q4 q5 $shared"),
      (3L, "b", toks("u", 12)),
      (4L, "b", toks("w", 9))).toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceSpanPressure(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6))))
      .toMap
    assert(got("a") == ((2L, 30L, 2L, 20L, 666666666L, "chrome_heavy")),
      s"got $got")
    assert(got("b") == ((2L, 21L, 0L, 0L, 0L, "clean")), s"got $got")
  }
}
