package graft.sinks

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame

/** A real binary `.xlsx` workbook sink (SURVEY §2.1 S4 — the reference
  * writes a multi-sheet Excel report, `/root/reference/Project.py:273-324`).
  * Closes the one functional gap of the CSV-per-sheet replacement
  * contract: the output opens in Excel.
  *
  * Built on the public OOXML package layout only (ECMA-376): an `.xlsx`
  * file is a zip of XML parts — `[Content_Types].xml`, the package
  * rels, `xl/workbook.xml` + its rels, and one
  * `xl/worksheets/sheetN.xml` per sheet. Cells use inline strings
  * (`t="inlineStr"`), which keeps the writer single-pass: no shared-
  * strings table to accumulate. No third-party library involved —
  * `java.util.zip` is the JDK.
  *
  * Scale note (deliberate): a workbook is a single zip stream, so this
  * sink is driver-side BY NATURE — it exists for REPORT artifacts
  * (aggregated frames: revenue by month, top-15 products), never for
  * fact data. Rows stream through `toLocalIterator` (one partition in
  * driver memory at a time) and the sink fails loudly past
  * `maxRowsPerSheet` instead of silently producing a file Excel cannot
  * open (the format's own row ceiling is 1 048 576).
  */
object Xlsx {

  private val MainNs =
    "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val RelNs =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
  private val PkgRelNs =
    "http://schemas.openxmlformats.org/package/2006/relationships"

  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    // literal control chars are invalid in XML 1.0; strip rather than
    // emit a workbook Excel refuses to open
    case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
    case c => c.toString
  }

  /** 0-based column index → A1-style letters (0→A, 25→Z, 26→AA). */
  private[sinks] def colRef(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.result()
  }

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case b: Boolean =>
      s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case n: Byte    => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Short   => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Int     => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Long    => s"""<c r="$ref"><v>$n</v></c>"""
    // NaN/Infinity are not valid numeric cell content (Excel declares
    // the workbook corrupt) — fall through to an inline string
    case n: Float if java.lang.Float.isFinite(n) =>
      s"""<c r="$ref"><v>$n</v></c>"""
    case n: Double if java.lang.Double.isFinite(n) =>
      s"""<c r="$ref"><v>$n</v></c>"""
    case n: java.math.BigDecimal => s"""<c r="$ref"><v>${n.toPlainString}</v></c>"""
    // dates/timestamps as their ISO-ish toString — no style table needed
    case other =>
      s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(other.toString)}</t></is></c>"""
  }

  /** Stream one worksheet's XML straight into the zip: rows go from
    * `toLocalIterator` to the compressed stream, so driver memory holds
    * one partition of rows + one row's XML — never the sheet (a
    * near-cap sheet would be multi-GB as a single string).
    */
  private def writeSheetEntry(zip: ZipOutputStream, df: DataFrame,
                              maxRows: Long): Unit = {
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(zip, "UTF-8"))
    w.write(s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="$MainNs"><sheetData>""")
    val cols = df.columns
    w.write("<row r=\"1\">")
    cols.zipWithIndex.foreach { case (c, i) =>
      w.write(cellXml(s"${colRef(i)}1", c))
    }
    w.write("</row>")
    var r = 1L
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      r += 1
      require(r <= maxRows + 1,
        s"writeXlsx: sheet exceeds $maxRows rows — a workbook is a " +
          "driver-side REPORT sink; write fact-scale data as parquet/CSV")
      w.write(s"""<row r="$r">""")
      cols.indices.foreach { i =>
        w.write(cellXml(s"${colRef(i)}$r", row.get(i)))
      }
      w.write("</row>")
    }
    w.write("</sheetData></worksheet>")
    // flush through to the zip WITHOUT closing it (closing the writer
    // would close the whole stream)
    w.flush()
  }

  /** Write `sheets` as one `.xlsx` file at `path` (a FILE path, not a
    * directory). Sheet names pass the reference's 31-char sanitizer and
    * are de-duplicated with a numeric suffix (Excel rejects duplicate
    * names).
    */
  def writeXlsx(sheets: Seq[(String, DataFrame)], path: String,
                maxRowsPerSheet: Long = 1048575L): Unit = {
    require(sheets.nonEmpty, "writeXlsx: no sheets")
    val seen = scala.collection.mutable.Set.empty[String]
    val named = sheets.map { case (raw, df) =>
      val base = Sinks.sanitizeSheetName(raw)
      var name = base
      var k = 2
      while (!seen.add(name)) {
        // truncate base so base+suffix never exceeds Excel's 31-char
        // sheet-name limit, whatever width the counter reaches
        val suffix = s"_$k"
        name = base.take(31 - suffix.length) + suffix
        k += 1
      }
      (name, df)
    }
    val zip = new ZipOutputStream(new FileOutputStream(path))
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    try {
      val n = named.size
      part("[Content_Types].xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
""" + (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
        ).mkString("\n") + "\n</Types>")
      part("_rels/.rels",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="$PkgRelNs">
<Relationship Id="rId1" Type="$RelNs/officeDocument" Target="xl/workbook.xml"/>
</Relationships>""")
      part("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="$MainNs" xmlns:r="$RelNs"><sheets>""" +
          named.zipWithIndex.map { case ((name, _), i) =>
            s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString + "</sheets></workbook>")
      part("xl/_rels/workbook.xml.rels",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="$PkgRelNs">""" +
          (1 to n).map(i =>
            s"""<Relationship Id="rId$i" Type="$RelNs/worksheet" Target="worksheets/sheet$i.xml"/>"""
          ).mkString + "</Relationships>")
      named.zipWithIndex.foreach { case ((_, df), i) =>
        zip.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${i + 1}.xml"))
        writeSheetEntry(zip, df, maxRowsPerSheet)
        zip.closeEntry()
      }
    } finally zip.close()
  }
}
