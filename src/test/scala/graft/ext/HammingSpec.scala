package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Binary sign codes + Hamming top-k (s24) on hand-built vectors. */
class HammingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vec(posDims: Set[Int]): Seq[Float] =
    (0 until 64).map(i => if (posDims(i)) 1.0f else -1.0f)

  test("binary codes pack sign bits into two 32-bit words; zero is not positive") {
    val rows = Seq(
      (1L, (0 until 64).map(i =>
        if (i == 0 || i == 33) 0.5f else if (i == 31) 0.0f else -1.0f)),
      (2L, vec(Set(31, 63))))
    val out = Similarity.binaryCodes(rows.toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // doc 1: dims 0 and 33 positive -> w0 bit0, w1 bit1; dim 31 is
    // 0.0 -> NOT set (strictly positive contract)
    assert(out(1L) == ((1L, 2L)))
    // doc 2: dims 31 and 63 -> the top bit of each word, no sign wrap
    assert(out(2L) == ((1L << 31, 1L << 31)))
  }

  test("hamming top-k: negation is maximally far, sign-twin is at 0") {
    val q = Set(1, 5, 40)
    val rows = Seq(
      (0L, vec(q)),                  // the query
      (1L, vec(q)),                  // identical signs -> 0
      (2L, vec(q + 7)),              // one extra positive dim -> 1
      (3L, vec((0 until 64).toSet -- q))) // full negation -> 64
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.hammingTopK(df.filter($"vec_id" === 0L), df, 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // self is excluded; order (hamming asc, id asc)
    assert(out.toSeq == Seq((1L, 1L, 0L), (2L, 2L, 1L), (3L, 3L, 64L)))
  }

  test("on pure sign vectors hamming order IS cosine order: recall 1") {
    // ±1 vectors: dot = 64 - 2·hamming with equal norms, so the two
    // rankings coincide and recall@k must be exactly 1e9
    val rows = (0L to 6L).map(i =>
      i -> vec((0 until i.toInt).toSet)).map { case (id, v) => (id, v) }
    val df = rows.toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" === 0L)
    val r = Similarity.recallAtK(
      Similarity.hammingTopK(q, df, 3),
      Similarity.bruteForceTopK(q, df, 3), 3).collect()
    assert(r.length == 1 && r.head.getLong(3) == 1000000000L)
  }

  test("magnitude is invisible to the code: scaled vector is at 0") {
    val q = Set(2, 3)
    val rows = Seq(
      (0L, vec(q)),
      (1L, vec(q).map(_ * 100.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.hammingTopK(df.filter($"vec_id" === 0L), df, 1)
      .collect()
    assert(out.length == 1 && out.head.getLong(3) == 0L)
  }

  test("a vector past 64 dims fails loudly instead of silently " +
    "truncating its sign bits") {
    // dim 65: the 65th sign bit has no word to land in; the contract
    // is an error, never a plausible-but-wrong Hamming distance
    val rows = Seq((1L, (0 until 65).map(_ => 1.0f)))
    val e = intercept[Exception] {
      Similarity.binaryCodes(rows.toDF("vec_id", "embedding")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++
        msgs(t.getCause)
    assert(msgs(e).exists(_.contains("64-dim sign-code")))
    // exactly 64 dims is INSIDE the contract
    val ok = Seq((1L, (0 until 64).map(_ => 1.0f)))
    val out = Similarity.binaryCodes(ok.toDF("vec_id", "embedding"))
      .collect()
    assert(out.length == 1 && out.head.getLong(1) == 0xFFFFFFFFL &&
      out.head.getLong(2) == 0xFFFFFFFFL)
  }
}
