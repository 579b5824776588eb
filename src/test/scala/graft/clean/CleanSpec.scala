package graft.clean

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.std.SchemaOps

/** Golden fixtures from FIXTURES.md §3 for the cleaning operators
  * (P1-P6, `/root/reference/Project.py:20-64`).
  */
class CleanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("P1 toSnake matches the reference regex chain (Project.py:20-23)") {
    assert(SchemaOps.toSnake("Unnamed: 0") == "unnamed_0")
    assert(SchemaOps.toSnake("Amt  (30) Days") == "amt_30_days")
    assert(SchemaOps.toSnake("TOTAL_DUE ") == "total_due")
    assert(SchemaOps.toSnake("__x__") == "x")
    assert(SchemaOps.toSnake("Total Line Price") == "total_line_price")
    assert(SchemaOps.toSnake("a-b.c") == "a_b_c")
  }

  test("P2 dropArtifacts removes only present artifact columns") {
    val df = Seq((1, "a", "b")).toDF("unnamed_0", "index", "keep")
    assert(SchemaOps.dropArtifacts(df).columns.toSeq == Seq("keep"))
  }

  test("P3 null-literal normalization is exact-match, post-trim, case-sensitive") {
    val df = Seq(" nan ", "None", "null", "NaN", " ok ").toDF("s")
    val got = Clean.normalizeStrings(df).collect().map(r =>
      Option(r.getString(0)))
    // "NaN" is NOT normalized (case-sensitive exact match, Project.py:38)
    assert(got.toSeq == Seq(None, None, None, Some("NaN"), Some("ok")))
  }

  test("P4 coercing numeric cast: bad -> null, not error") {
    val df = Seq(("12.5", 1), ("abc", 2), ("", 3), (" 7 ", 4))
      .toDF("quantity", "id")
    val got = Clean.castNumerics(df).collect()
      .sortBy(_.getInt(1)).map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(12.5), None, None, Some(7.0)))
  }

  test("P4 only touches columns present in the schema") {
    val df = Seq(("x", "y")).toDF("quantity", "untouched")
    val out = Clean.castNumerics(df)
    assert(out.schema("quantity").dataType.typeName == "double")
    assert(out.schema("untouched").dataType.typeName == "string")
  }

  test("P5 coercing timestamp parse: bad -> null") {
    val df = Seq(("2024-02-01 10:00:00", 1), ("2024-02-30", 2), ("nope", 3))
      .toDF("trans_date", "id")
    val got = Clean.parseDates(df).collect()
      .sortBy(_.getInt(1)).map(r => Option(r.get(0)))
    assert(got(0).contains(Timestamp.valueOf("2024-02-01 10:00:00")))
    assert(got(1).isEmpty) // Feb 30 is invalid → null (non-ANSI)
    assert(got(2).isEmpty)
  }

  test("P6 event_date is COLUMN-level fallback, not per-row coalesce") {
    val df = Seq((None: Option[String], Some("2024-01-01 00:00:00")))
      .toDF("trans_date", "deposit_date")
    val out = Clean.withEventDate(Clean.parseDates(df)).head()
    // trans_date column exists ⇒ event_date mirrors it wholesale:
    // null even though deposit_date is present (Project.py:58-64)
    assert(out.isNullAt(out.fieldIndex("event_date")))
  }

  test("P6 falls back to deposit_date only when trans_date column is absent") {
    val df = Seq(Some("2024-01-01 00:00:00")).toDF("deposit_date")
    val out = Clean.withEventDate(Clean.parseDates(df)).head()
    assert(out.getTimestamp(out.fieldIndex("event_date")) ==
      Timestamp.valueOf("2024-01-01 00:00:00"))
  }

  test("P7 findColumn: pattern priority beats column order") {
    val cols = Seq("region_code", "product_code", "product_description")
    assert(SchemaOps.findProductColumn(cols).contains("product_description"))
    // description-tier absent → code-tier fallback
    assert(SchemaOps.findProductColumn(Seq("x", "product_code")).contains("product_code"))
    assert(SchemaOps.findColumn(Seq("zzz"), cols).isEmpty)
  }
}
