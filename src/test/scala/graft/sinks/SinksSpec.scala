package graft.sinks

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-trip tests for the S2/S3 sinks against the reference's JSONL
  * contract (`/root/reference/Project.py:341-361`): explicit nulls kept,
  * timestamps ISO-8601, one object per line.
  */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out").toString

  private def frame = Seq(
    (1L, Some("a"), Some(1.5), Some(Timestamp.valueOf("2024-03-01 12:30:00"))),
    (2L, None, None, None)
  ).toDF("id", "s", "x", "ts")

  test("S3 JSONL keeps explicit nulls and ISO timestamps") {
    val path = tmp("jsonl")
    Sinks.writeJsonl(frame, path)
    val lines = Files.list(java.nio.file.Paths.get(path)).toArray
      .map(_.toString).filter(_.endsWith(".json"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
    assert(lines.length == 2)
    val nullRow = lines.find(_.contains("\"id\":2")).get
    // null preservation (ignoreNullFields=false ≡ Project.py:349)
    assert(nullRow.contains("\"s\":null") && nullRow.contains("\"x\":null")
      && nullRow.contains("\"ts\":null"))
    val fullRow = lines.find(_.contains("\"id\":1")).get
    assert(fullRow.contains("2024-03-01T12:30:00.000Z")) // ISO-8601, UTC
  }

  test("S3 JSONL round-trips through spark.read.json") {
    val path = tmp("jsonl_rt")
    Sinks.writeJsonl(frame, path)
    val back = spark.read.json(path)
    assert(back.count() == 2)
    assert(back.filter(col("s").isNull).count() == 1)
  }

  test("S2 CSV round-trips with header") {
    val path = tmp("csv")
    Sinks.writeCsv(frame.select("id", "s", "x"), path)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    assert(back.columns.toSeq == Seq("id", "s", "x"))
    assert(back.count() == 2)
    assert(back.filter(col("id") === 1).head().getDouble(2) == 1.5)
  }

  test("P14 projection takes schema intersection in wanted order") {
    val df = Seq((1, "x", 2.0)).toDF("doc_number", "cust_desc", "total_due")
    val got = Sinks.projectCollection(df, Sinks.ReceivablesColumns)
    assert(got.columns.toSeq == Seq("cust_desc", "total_due"))
  }

  test("S4 sheet-name sanitizer: title-case + 31-char cap (Project.py:303)") {
    assert(Sinks.sanitizeSheetName("revenue_by_month") == "Revenue By Month")
    assert(Sinks.sanitizeSheetName("a" * 40).length == 31)
  }
}
