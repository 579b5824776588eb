package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Schema-on-read JSON extraction. */
class SemiStructuredSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("typed extraction; malformed and missing fields go NULL") {
    val df = Seq(
      (1L, """{"k": 7, "name": "a"}"""),
      (2L, """{"k": "not-a-number", "name": "b"}"""),
      (3L, """{"name": "c"}"""),
      (4L, """not json at all"""),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "props")
    val out = SemiStructured.extractJson(df, "props",
      Seq("k" -> "BIGINT", "name" -> "STRING")).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
          Option(r.getString(2))))).toMap
    assert(out(1L) == ((Some(7L), Some("a"))))
    assert(out(2L) == ((None, Some("b"))))       // type mismatch -> null field
    assert(out(3L) == ((None, Some("c"))))       // missing key -> null
    assert(out(4L) == ((None, None)))            // malformed -> null row
    assert(out(5L) == ((None, None)))            // null payload survives
    assert(out.size == 5)
    // the raw JSON column is gone from the projection
    assert(!SemiStructured.extractJson(df, "props", Seq("k" -> "BIGINT"))
      .columns.contains("props"))
  }
}
