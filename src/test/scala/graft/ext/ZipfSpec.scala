package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Zipf fit: an exact power law recovers slope −1 with R² = 1; a flat
  * distribution fits slope 0; languages fit independently.
  */
class ZipfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def doc(id: Long, lang: String, text: String) =
    (id, lang, text)

  test("exact freq = C/rank data fits slope -1, r2 = 1") {
    // freqs 12, 6, 4, 3 at ranks 1..4: freq * rank = 12 everywhere
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val docs = Seq(doc(1L, "en", text)).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.zipfFit(docs).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(1) == 25L && row.getLong(2) == 4L)
    assert(row.getDouble(3) == -1.0, s"slope ${row.getDouble(3)}")
    assert(row.getDouble(5) == 1.0, s"r2 ${row.getDouble(5)}")
    // intercept = ln(12) at rank 1
    assert(math.abs(row.getDouble(4) - math.log(12.0)) < 1e-5)
  }

  test("uniform frequencies fit slope 0 with undefined r2") {
    val docs = Seq(doc(1L, "en", "a b c d a b c d"))
      .toDF("doc_id", "lang", "text")
    val row = TextAnalysis.zipfFit(docs).collect()(0)
    assert(row.getDouble(3) == 0.0)
    assert(row.isNullAt(5), "zero y-variance must not fake a fit")
  }

  test("languages fit independently") {
    val zipf = (Seq.fill(6)("x") ++ Seq.fill(3)("y") ++
      Seq.fill(2)("z")).mkString(" ")
    val docs = Seq(
      doc(1L, "en", zipf), doc(2L, "fr", "a b a b a b"))
      .toDF("doc_id", "lang", "text")
    val r = TextAnalysis.zipfFit(docs).collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    // en: freqs 6,3,2 at ranks 1,2,3 — freq*rank = 6: exact Zipf
    assert(r("en") == -1.0)
    // fr: both tokens at freq 3 — flat
    assert(r("fr") == 0.0)
  }
}
