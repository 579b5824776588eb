package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** t73 TF-IDF top terms: hand-traced scores on a 3-doc corpus, the
  * term-ascending tie rule, the zero score for a term in every doc,
  * and the topK cut.
  */
class TfidfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def topTermsOf(docs: Seq[(Long, String)], topK: Int)
      : Map[(Long, Long), (String, Long, Double)] =
    TextAnalysis.tfidfTopTerms(docs.toDF("doc_id", "text"), topK)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getString(1), r.getLong(3), r.getDouble(4)))).toMap

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-traced scores, tie on term, rare term outranks frequent") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry date"))
    val got = topTermsOf(docs, 2)
    val ln3 = r9(math.log(3.0))       // df=1
    val ln15 = r9(math.log(1.5))      // df=2
    val expected = Map(
      (1L, 1L) -> (("apple", 2L, r9(2 * ln3))),
      (1L, 2L) -> (("banana", 1L, ln15)),
      // d2: banana and cherry tie at ln(1.5) — term ascending
      (2L, 1L) -> (("banana", 1L, ln15)),
      (2L, 2L) -> (("cherry", 1L, ln15)),
      // d3: the single rare "date" (ln 3) outranks double "cherry"
      // (2·ln 1.5 = 0.811)
      (3L, 1L) -> (("date", 1L, ln3)),
      (3L, 2L) -> (("cherry", 2L, r9(2 * ln15))))
    assert(got == expected, s"got $got")
  }

  test("a term in every doc scores exactly 0 and never makes the cut") {
    val docs = Seq(
      (1L, "the apple"),
      (2L, "the banana"),
      (3L, "the cherry"))
    val got = topTermsOf(docs, 1)
    assert(got.values.map(_._1).toSet == Set("apple", "banana", "cherry"),
      s"'the' (idf = ln 1 = 0) must lose to every unique term: $got")
    // and with topK past the vocabulary, 'the' shows up with tfidf 0.0
    val all = topTermsOf(docs, 10)
    val the = all.values.filter(_._1 == "the")
    assert(the.size == 3 && the.forall(_._3 == 0.0), s"got $all")
  }
}
