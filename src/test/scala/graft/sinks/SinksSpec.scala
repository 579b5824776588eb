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

  test("ORC round-trips with nulls and timestamps intact") {
    val path = tmp("orc")
    Sinks.writeOrc(frame, path)
    val back = spark.read.orc(path)
    assert(back.count() == 2)
    // ORC reads everything back nullable; compare names + types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      frame.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.filter(col("s").isNull).count() == 1)
    assert(back.filter(col("id") === 1).head()
      .getTimestamp(3) == java.sql.Timestamp.valueOf("2024-03-01 12:30:00"))
  }

  test("P14 projection takes schema intersection in wanted order") {
    val df = Seq((1, "x", 2.0)).toDF("doc_number", "cust_desc", "total_due")
    val got = Sinks.projectCollection(df, Sinks.ReceivablesColumns)
    assert(got.columns.toSeq == Seq("cust_desc", "total_due"))
  }

  test("S4 sheet-name sanitizer: Python str.title() parity + 31-char cap") {
    assert(Sinks.sanitizeSheetName("revenue_by_month") == "Revenue By Month")
    assert(Sinks.sanitizeSheetName("a" * 40).length == 31)
    // title() capitalizes after any non-letter, digits included
    assert(Sinks.sanitizeSheetName("ab2cd") == "Ab2Cd")
    assert(Sinks.sanitizeSheetName("q2_2025_sales") == "Q2 2025 Sales")
    assert(Sinks.sanitizeSheetName("it's") == "It'S") // yes, Python does this
  }

  test("S4 replacement: workbook writes one CSV dir per sanitized sheet") {
    val dir = tmp("workbook")
    Sinks.writeWorkbook(Seq(
      "summary" -> frame.select("id"),
      "full_data" -> frame.select("id", "s")), dir)
    val sheets = new java.io.File(dir).list().sorted
    assert(sheets.toSeq == Seq("Full_Data", "Summary"))
    val back = spark.read.option("header", "true").csv(s"$dir/Full_Data")
    assert(back.columns.toSeq == Seq("id", "s"))
  }

  test("S4 e2e: the reference's Excel deliverable — q5 summary + p14 " +
       "trio as one workbook over sf0.01") {
    // Project.py:273-324 writes the BI outputs as one multi-sheet
    // workbook; this is that deliverable over the real sf0.01 star join
    val sfDir = "/root/testdata/sf0.01"
    val cleaned = graft.queries.Merged.cleanedShared(spark, sfDir)
    try {
      val sheets = Seq(
        "summary" -> graft.queries.BiQueries.summary(cleaned),
        "sales_lines" ->
          Sinks.projectCollection(cleaned, Sinks.SalesLinesColumns),
        "receivables" ->
          Sinks.projectCollection(cleaned, Sinks.ReceivablesColumns),
        "payments" ->
          Sinks.projectCollection(cleaned, Sinks.PaymentsColumns))
      val expect = sheets.map { case (n, df) => n -> df.count() }
      assert(expect.head._2 == 1L) // q5 is one row of summary scalars
      assert(expect.tail.forall(_._2 > 10000L),
        "p14 sheets should carry the sf0.01 fact rows")
      val path = tmp("wb_e2e") + "/report.xlsx"
      new java.io.File(path).getParentFile.mkdirs()
      Xlsx.writeXlsx(sheets, path)
      val zf = new java.util.zip.ZipFile(path)
      try {
        // sheet names pass the Python-title sanitizer, in declared order
        val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        f.setNamespaceAware(true)
        val wb = f.newDocumentBuilder()
          .parse(zf.getInputStream(zf.getEntry("xl/workbook.xml")))
          .getElementsByTagNameNS("*", "sheet")
        val names = (0 until wb.getLength).map(i =>
          wb.item(i).getAttributes.getNamedItem("name").getNodeValue)
        assert(names == Seq("Summary", "Sales Lines", "Receivables",
          "Payments"))
        // per-sheet row counts: header + every frame row (streamed count
        // of "<row " — a DOM parse of a 60k-row sheet is needless heap)
        def countRows(entry: String): Long = {
          val pat = "<row ".getBytes("UTF-8")
          val in = zf.getInputStream(zf.getEntry(entry))
          try {
            val buf = new Array[Byte](1 << 16)
            var n = 0L; var m = 0; var r = in.read(buf)
            while (r > 0) {
              var i = 0
              while (i < r) {
                if (buf(i) == pat(m)) {
                  m += 1; if (m == pat.length) { n += 1; m = 0 }
                } else m = if (buf(i) == pat(0)) 1 else 0
                i += 1
              }
              r = in.read(buf)
            }
            n
          } finally in.close()
        }
        expect.zipWithIndex.foreach { case ((name, rows), i) =>
          val got = countRows(s"xl/worksheets/sheet${i + 1}.xml")
          assert(got == rows + 1,
            s"sheet '$name': expected ${rows + 1} rows incl header, got $got")
        }
      } finally zf.close()
    } finally graft.queries.Merged.releaseShared(spark)
  }

  test("S4 e2e: curation report — mixture plan + cardinality + lang " +
       "stats as one workbook over sf0.01") {
    // the LLM-pipeline analogue of the reference's Excel deliverable:
    // the curation-planning outputs (t26 sampling rates, t24 vocabulary
    // sketch, t2 per-language stats) as one multi-sheet workbook
    val sfDir = "/root/testdata/sf0.01"
    try {
      val sheets = Seq(
        "mixture_plan" ->
          graft.ext.ExtQueries.temperatureResample(spark, sfDir),
        "token_cardinality" ->
          graft.ext.ExtQueries.kmvCardinality(spark, sfDir),
        "lang_stats" -> graft.ext.ExtQueries.langStats(spark, sfDir))
      val expect = sheets.map { case (n, df) => n -> df.count() }
      assert(expect(0)._2 == 20L, "one mixture row per source")
      assert(expect(1)._2 == 5L, "one sketch row per language")
      assert(expect(2)._2 == 5L, "one stats row per language")
      val path = tmp("wb_curation") + "/curation.xlsx"
      new java.io.File(path).getParentFile.mkdirs()
      Xlsx.writeXlsx(sheets, path)
      val zf = new java.util.zip.ZipFile(path)
      try {
        val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        f.setNamespaceAware(true)
        val wb = f.newDocumentBuilder()
          .parse(zf.getInputStream(zf.getEntry("xl/workbook.xml")))
          .getElementsByTagNameNS("*", "sheet")
        val names = (0 until wb.getLength).map(i =>
          wb.item(i).getAttributes.getNamedItem("name").getNodeValue)
        assert(names == Seq("Mixture Plan", "Token Cardinality",
          "Lang Stats"))
        // each sheet carries header + every frame row (tiny — DOM parse
        // is fine here, but reuse the entry count for symmetry)
        expect.zipWithIndex.foreach { case ((name, rows), i) =>
          val sheet = f.newDocumentBuilder().parse(
            zf.getInputStream(zf.getEntry(s"xl/worksheets/sheet${i + 1}.xml")))
          val got = sheet.getElementsByTagNameNS("*", "row").getLength
          assert(got == rows + 1,
            s"sheet '$name': expected ${rows + 1} rows incl header, got $got")
        }
      } finally zf.close()
    } finally graft.std.Materialize.releaseAll()
  }

  test("S4 binary .xlsx: valid OOXML package, typed cells, dedup names") {
    val path = tmp("xlsx") + ".xlsx"
    new java.io.File(path).getParentFile.mkdirs()
    Xlsx.writeXlsx(Seq(
      "summary" -> frame,
      "summary" -> frame.select("id")), path) // same name → suffixed
    val zf = new java.util.zip.ZipFile(path)
    try {
      val entries = {
        val e = zf.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result().toSet
      }
      assert(entries == Set("[Content_Types].xml", "_rels/.rels",
        "xl/workbook.xml", "xl/_rels/workbook.xml.rels",
        "xl/worksheets/sheet1.xml", "xl/worksheets/sheet2.xml"))
      def xml(name: String) = {
        val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        f.setNamespaceAware(true)
        f.newDocumentBuilder().parse(zf.getInputStream(zf.getEntry(name)))
      }
      // every part is well-formed XML (DocumentBuilder throws otherwise)
      entries.foreach(xml)
      val wb = xml("xl/workbook.xml").getElementsByTagNameNS("*", "sheet")
      assert(wb.getLength == 2)
      assert(wb.item(0).getAttributes.getNamedItem("name")
        .getNodeValue == "Summary")
      assert(wb.item(1).getAttributes.getNamedItem("name")
        .getNodeValue != "Summary") // deduplicated
      val s1 = xml("xl/worksheets/sheet1.xml")
      // header row + 2 data rows; numeric cells as <v>, strings inline,
      // null cells omitted
      assert(s1.getElementsByTagNameNS("*", "row").getLength == 3)
      val cells = s1.getElementsByTagNameNS("*", "c")
      val a2 = (0 until cells.getLength).map(cells.item)
        .find(_.getAttributes.getNamedItem("r").getNodeValue == "A2").get
      assert(a2.getTextContent == "1")
    } finally zf.close()
  }

  test("S4 xlsx embeds the chart PNGs as OOXML drawing parts") {
    import graft.queries.{BiQueries, Merged}
    val path = tmp("xlsx_img") + "/report.xlsx"
    new java.io.File(path).getParentFile.mkdirs()
    val cleaned = Merged.cleaned(spark, "/root/testdata/sf0.001")
    Charts.writeReportXlsx(
      Seq("summary" -> BiQueries.summary(cleaned)),
      BiQueries.revenueByMonth(cleaned), BiQueries.topProducts(cleaned),
      path)
    val zf = new java.util.zip.ZipFile(path)
    try {
      def xml(name: String) = {
        val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        f.setNamespaceAware(true)
        f.newDocumentBuilder().parse(zf.getInputStream(zf.getEntry(name)))
      }
      // the image parts are real decodable PNGs inside the package
      Seq("xl/media/image1.png", "xl/media/image2.png").foreach { p =>
        assert(zf.getEntry(p) != null, s"missing $p")
        val img = javax.imageio.ImageIO.read(zf.getInputStream(zf.getEntry(p)))
        assert(img != null && img.getWidth == 900 && img.getHeight == 540)
      }
      // content types declare png + both drawing parts
      val ct = scala.io.Source.fromInputStream(
        zf.getInputStream(zf.getEntry("[Content_Types].xml"))).mkString
      assert(ct.contains("Extension=\"png\"") &&
        ct.contains("/xl/drawings/drawing1.xml") &&
        ct.contains("/xl/drawings/drawing2.xml"))
      // chart sheets follow the data sheet and carry a <drawing r:id>
      val wb = xml("xl/workbook.xml").getElementsByTagNameNS("*", "sheet")
      val names = (0 until wb.getLength).map(i =>
        wb.item(i).getAttributes.getNamedItem("name").getNodeValue)
      assert(names == Seq("Summary", "Revenue Chart", "Top Products Chart"))
      val sheet2 = xml("xl/worksheets/sheet2.xml")
      assert(sheet2.getElementsByTagNameNS("*", "drawing").getLength == 1)
      // drawing part: one picture whose blip embed resolves through the
      // drawing rels to the media part
      val d1 = xml("xl/drawings/drawing1.xml")
      assert(d1.getElementsByTagNameNS("*", "pic").getLength == 1)
      val blip = d1.getElementsByTagNameNS("*", "blip").item(0)
      val embedId = blip.getAttributes.getNamedItemNS(
        "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
        "embed").getNodeValue
      val rels = xml("xl/drawings/_rels/drawing1.xml.rels")
        .getElementsByTagNameNS("*", "Relationship")
      val rel = (0 until rels.getLength).map(rels.item)
        .find(_.getAttributes.getNamedItem("Id").getNodeValue == embedId).get
      assert(rel.getAttributes.getNamedItem("Target").getNodeValue ==
        "../media/image1.png")
      assert(rel.getAttributes.getNamedItem("Type").getNodeValue
        .endsWith("/image"))
      // sheet→drawing relationship is valid too
      val srel = xml("xl/worksheets/_rels/sheet2.xml.rels")
        .getElementsByTagNameNS("*", "Relationship").item(0)
      assert(srel.getAttributes.getNamedItem("Target").getNodeValue ==
        "../drawings/drawing1.xml")
      // 0.8 scale in EMU: 900px*0.8*9525 = 6 858 000
      val ext = d1.getElementsByTagNameNS("*", "ext").item(0)
      assert(ext.getAttributes.getNamedItem("cx").getNodeValue == "6858000")
      // every new part is well-formed XML
      Seq("xl/drawings/drawing2.xml", "xl/worksheets/sheet3.xml",
        "xl/worksheets/_rels/sheet3.xml.rels",
        "xl/drawings/_rels/drawing2.xml.rels").foreach(xml)
    } finally zf.close()
  }

  test("xlsx column refs follow A1 lettering past Z") {
    assert(Seq(0, 25, 26, 27, 51, 52, 701, 702)
      .map(Xlsx.colRef) == Seq("A", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA"))
  }

  test("S5 PNG charts render headless: revenue is a LINE, products are BARS") {
    import graft.queries.{BiQueries, Merged}
    val dir = tmp("charts")
    val cleaned = Merged.cleaned(spark, "/root/testdata/sf0.001")
    Charts.writeCharts(BiQueries.revenueByMonth(cleaned),
      BiQueries.topProducts(cleaned), dir)
    // per-column plotted-pixel profile (C0 blue, tolerant of the
    // antialiased edge): a LINE has broad column coverage but a thin
    // average vertical run; BARS fill tall contiguous runs
    def profile(f: String): (Int, Seq[Int]) = {
      val img = javax.imageio.ImageIO.read(new java.io.File(s"$dir/$f"))
      assert(img.getWidth == 900 && img.getHeight == 540)
      def isBlue(rgb: Int): Boolean = {
        val c = new java.awt.Color(rgb)
        math.abs(c.getRed - 31) + math.abs(c.getGreen - 119) +
          math.abs(c.getBlue - 180) < 90
      }
      val counts = (0 until img.getWidth).map(x =>
        (0 until img.getHeight).count(y => isBlue(img.getRGB(x, y))))
      (counts.count(_ > 0), counts)
    }
    val (revCols, revCounts) = profile("revenue_by_month.png")
    val (topCols, topCounts) = profile("top_products.png")
    // both charts plotted something across most of the plot width
    assert(revCols > 500, s"revenue line spans $revCols columns")
    assert(topCols > 400, s"product bars span $topCols columns")
    // the mark-type discriminator: the revenue polyline's MEDIAN
    // occupied-column run is a few pixels (stroke + marker), while the
    // product bars' median run is the bar height — far taller
    def median(xs: Seq[Int]): Int = {
      val s = xs.filter(_ > 0).sorted; s(s.length / 2)
    }
    val revMed = median(revCounts)
    val topMed = median(topCounts)
    assert(revMed < 30, s"revenue chart median run $revMed px — bars?")
    assert(topMed > 60, s"products chart median run $topMed px — no bars?")
  }

  test("S6 end-to-end: three collection JSONL dirs with full row counts") {
    import graft.queries.Merged
    val dir = tmp("collections")
    val cleaned = Merged.cleaned(spark, "/root/testdata/sf0.001")
    Sinks.exportCollections(cleaned, dir)
    val n = cleaned.count()
    for (c <- Seq("sales_lines", "receivables", "payments")) {
      val back = spark.read.json(s"$dir/$c")
      assert(back.count() == n, s"collection $c row count")
    }
    // sales_lines keeps the P14 intersection schema (inventory_code and
    // rep_code never existed upstream)
    val sl = spark.read.json(s"$dir/sales_lines")
    assert(!sl.columns.contains("inventory_code"))
    assert(sl.columns.contains("fin_week_label"))
  }

  test("A-path end-to-end from CSV with inferSchema (the reference's input format)") {
    import graft.queries.Merged
    val dir = tmp("csv_src")
    // messy headers exactly like a pandas-exported CSV
    val csv = Seq(
      "Unnamed: 0,Quantity,Total Line Price,Last Cost,Trans Date,TRANS-TYPE Code",
      "0,2.0,10.0,3.0,2024-03-15,1",
      "1,abc,20.0,4.0,not-a-date,2",
      "2,-1.0,5.0,,2024-12-28,3").mkString("\n")
    val f = java.nio.file.Files.createTempDirectory("raw").resolve("m.csv")
    java.nio.file.Files.writeString(f, csv)
    val raw = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(f.toString)
    val out = Merged.clearvuePipeline(raw)
    val rows = out.collect().sortBy(_.getAs[Int]("trans_type_code"))
    assert(out.columns.contains("trans_type_code")) // snake_cased
    assert(!out.columns.contains("unnamed_0")) // P2 artifact drop
    // coerced cast: "abc" quantity → null; fiscal calendar applied
    assert(rows(1).isNullAt(rows(1).fieldIndex("quantity")))
    assert(rows(0).getString(rows(0).fieldIndex("fin_month_label")) == "2024-03")
    // Dec 28 2024 is after Dec's last Friday (12-27) → FY rollover
    assert(rows(2).getString(rows(2).fieldIndex("fin_month_label")) == "2025-01")
    // flags present and non-null
    assert(rows(2).getBoolean(rows(2).fieldIndex("flag_negative_qty")))
  }
}
