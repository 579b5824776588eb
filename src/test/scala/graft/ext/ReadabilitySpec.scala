package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** t75 readability: hand-counted sentences/words/vowel-group
  * syllables, a formula replay at 6 dp, the min-1 conventions, and
  * the wordless-doc NULL path.
  */
class ReadabilitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def scoresOf(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Any, Any, String)] =
    TextAnalysis.readability(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getDouble(5),
        r.getString(6)))).toMap

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def flesch(w: Long, s: Long, syl: Long): Double =
    r6(206.835 - 1.015 * (w.toDouble / s) - 84.6 * (syl.toDouble / w))

  private def fk(w: Long, s: Long, syl: Long): Double =
    r6(0.39 * (w.toDouble / s) + 11.8 * (syl.toDouble / w) - 15.59)

  test("hand-counted simple vs complex prose, bands included") {
    val got = scoresOf(Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, "Extraordinary circumstances necessitate immediate " +
        "reconsideration.")))
    // doc 1: 2 sentences, 6 one-syllable words
    assert(got(1L) == ((2L, 6L, 6L, flesch(6, 2, 6), fk(6, 2, 6),
      "easy")), s"got $got")
    // doc 2: 1 sentence, 5 words, vowel groups 5+4+5+4+6 = 24
    assert(got(2L) == ((1L, 5L, 24L, flesch(5, 1, 24), fk(5, 1, 24),
      "very_difficult")), s"got $got")
    assert(got(1L)._4.asInstanceOf[Double] > 70.0)
    assert(got(2L)._4.asInstanceOf[Double] < 30.0)
  }

  test("min-1 conventions and the wordless NULL path") {
    val got = scoresOf(Seq(
      (1L, "Dr X"),     // no sentence punctuation, vowel-less words
      (2L, "!!! ???"))) // no words at all
    // doc 1: sentences floor to 1; "dr" and "x" each cost 1 syllable
    assert(got(1L) == ((1L, 2L, 2L, flesch(2, 1, 2), fk(2, 1, 2),
      "easy")), s"got $got")
    // doc 2: one punctuation run counts as a sentence, zero words ->
    // NULL scores, unscored band, never a division error
    assert(got(2L) == ((2L, 0L, 0L, null, null, "unscored")),
      s"got $got")
  }

  test("null text is dropped, not scored as size(NULL) = -1") {
    // with ANSI off, size(NULL) = -1: an unfiltered null-text row would
    // score n_words = -1 while the DuckDB twin COALESCEs to 0 — the
    // operator must drop the row entirely (unscorable, not zero-length)
    val got = scoresOf(Seq((1L, "The cat sat."), (2L, null)))
    assert(got.keySet == Set(1L), s"got $got")
  }
}
