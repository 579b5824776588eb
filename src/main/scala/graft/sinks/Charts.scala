package graft.sinks

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage
import java.io.File

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** PNG chart rendering (SURVEY §2.1 S5 — the reference renders
  * matplotlib charts of Q1 revenue-by-month and Q2 top-products,
  * `/root/reference/Project.py:226-267`). Pure-JDK headless rendering
  * (`java.awt.image` + `javax.imageio`): no plotting dependency, works
  * in a server JRE.
  *
  * Driver-side BY NATURE like [[Xlsx]]: a chart consumes an aggregated
  * report frame (≤ a few hundred bars), never fact data — enforced with
  * a loud row cap, not a silent truncation.
  */
object Charts {

  private val Bg = Color.WHITE
  private val BarFill = new Color(31, 119, 180)  // matplotlib C0
  private val AxisCol = Color.DARK_GRAY

  /** Shared chart scaffolding — background, axes + zero line, min/0/max
    * y ticks, rotated thinned x labels, title; only the MARKS differ
    * between the bar and line renderers, so they inject them.
    * `drawMarks(g, yOf, left, step)` runs with the fill color set;
    * mark i's horizontal slot is `[left + i·step, left + (i+1)·step)`.
    */
  private def renderChartPng(labels: Seq[String], values: Seq[Double],
                             title: String, path: String,
                             width: Int, height: Int,
                             maxMarks: Int, kind: String)(
      drawMarks: (Graphics2D, Double => Int, Int, Double) => Unit)
      : Unit = {
    require(labels.nonEmpty && labels.size == values.size,
      s"$kind: ${labels.size} labels vs ${values.size} values")
    require(labels.size <= maxMarks,
      s"$kind: ${labels.size} marks — charts render REPORT " +
        "aggregates; reduce before plotting")
    System.setProperty("java.awt.headless", "true")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics().asInstanceOf[Graphics2D]
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Bg); g.fillRect(0, 0, width, height)
      val (l, r, top, bot) = (70, 20, 50, 90)
      val plotW = width - l - r
      val plotH = height - top - bot
      val maxV = math.max(values.max, 0.0)
      val minV = math.min(values.min, 0.0)
      val span = if (maxV - minV == 0) 1.0 else maxV - minV
      def y(v: Double): Int = top + ((maxV - v) / span * plotH).toInt
      // axes + zero line
      g.setColor(AxisCol)
      g.setStroke(new BasicStroke(1.5f))
      g.drawLine(l, top, l, top + plotH)
      g.drawLine(l, y(0), l + plotW, y(0))
      // y tick labels (min / 0 / max)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
      Seq(minV, 0.0, maxV).distinct.foreach { v =>
        g.drawString(f"$v%,.0f", 4, y(v) + 4)
      }
      val n = values.size
      val step = plotW.toDouble / n
      g.setColor(BarFill)
      drawMarks(g, y, l, step)
      // x labels: rotated when crowded, every k-th so they stay legible
      g.setColor(AxisCol)
      val every = math.max(1, n / 24)
      val oldTx = g.getTransform
      labels.zipWithIndex.foreach { case (lab, i) =>
        if (i % every == 0) {
          val x = l + (i * step + step / 2).toInt
          g.rotate(-Math.PI / 4, x.toDouble, (top + plotH + 12).toDouble)
          g.drawString(lab.take(16), x - 30, top + plotH + 14)
          g.setTransform(oldTx)
        }
      }
      // title
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 16))
      g.drawString(title, l, 30)
    } finally g.dispose()
    val ok = ImageIO.write(img, "png", new File(path))
    require(ok, s"$kind: no PNG writer available")
  }

  /** Render a vertical bar chart to `path` (a `.png` FILE path). */
  def writeBarChartPng(labels: Seq[String], values: Seq[Double],
                       title: String, path: String,
                       width: Int = 900, height: Int = 540,
                       maxBars: Int = 500): Unit =
    renderChartPng(labels, values, title, path, width, height,
      maxBars, "writeBarChartPng") { (g, y, l, step) =>
      val barW = math.max(1, (step * 0.8).toInt)
      values.zipWithIndex.foreach { case (v, i) =>
        val x = l + (i * step + step * 0.1).toInt
        val (yTop, h) =
          if (v >= 0) (y(v), y(0) - y(v)) else (y(0), y(v) - y(0))
        g.fillRect(x, yTop, barW, math.max(1, h))
      }
    }

  /** Render a line chart with circular markers to `path` (a `.png`
    * FILE path) — the reference's revenue-trend mark type
    * (`/root/reference/Project.py:232-233`: `plt.plot(..., marker='o',
    * linewidth=2)`), distinct from [[writeBarChartPng]]'s bars.
    */
  def writeLineChartPng(labels: Seq[String], values: Seq[Double],
                        title: String, path: String,
                        width: Int = 900, height: Int = 540,
                        maxPoints: Int = 500): Unit =
    renderChartPng(labels, values, title, path, width, height,
      maxPoints, "writeLineChartPng") { (g, y, l, step) =>
      // polyline through point centers, then markers on top — a
      // single point degenerates to its marker (no segment to draw)
      def x(i: Int): Int = l + (i * step + step / 2).toInt
      g.setStroke(new BasicStroke(2f, BasicStroke.CAP_ROUND,
        BasicStroke.JOIN_ROUND))
      values.indices.sliding(2).foreach {
        case Seq(a, b) =>
          g.drawLine(x(a), y(values(a)), x(b), y(values(b)))
        case _ => ()
      }
      val mr = 4
      values.zipWithIndex.foreach { case (v, i) =>
        g.fillOval(x(i) - mr, y(v) - mr, 2 * mr, 2 * mr)
      }
    }

  /** The reference's two report charts (`Project.py:226-267`) from their
    * query frames: revenue per fiscal month as a LINE chart
    * (`Project.py:232`) and top-product revenue as bars
    * (`Project.py:255`). Ordering matches [[Sinks.writeChartData]]'s
    * chart-input contract.
    */
  def writeCharts(revenueByMonth: DataFrame, topProducts: DataFrame,
                  dir: String, maxBars: Int = 500): Unit = {
    new File(dir).mkdirs()
    // limit BEFORE collect: the bar cap must fire as a loud plan-side
    // guard, not after a million-row collect has already OOMed the
    // driver (limit maxBars+1 keeps the over-cap case detectable)
    def capped(df: DataFrame): Array[org.apache.spark.sql.Row] = {
      val rows = df.limit(maxBars + 1).collect()
      require(rows.length <= maxBars,
        s"writeCharts: more than $maxBars bars — charts render REPORT " +
          "aggregates; reduce before plotting")
      rows
    }
    // cast up front: a caller whose revenue is DecimalType (sum over
    // decimals) must not hit a ClassCastException at getDouble
    val rev = capped(revenueByMonth.orderBy(col("fin_month_label"))
      .select(col("fin_month_label"), col("revenue").cast("double")))
    writeLineChartPng(
      rev.map(_.getString(0)).toSeq,
      rev.map(r => r.getDouble(1)).toSeq,
      "Revenue by financial month", s"$dir/revenue_by_month.png",
      maxPoints = maxBars)
    val top = capped(topProducts
      .orderBy(col("revenue").desc, col("product_desc"))
      .select(col("product_desc"), col("revenue").cast("double")))
    writeBarChartPng(
      top.map(_.getString(0)).toSeq,
      top.map(r => r.getDouble(1)).toSeq,
      "Top products by revenue", s"$dir/top_products.png",
      maxBars = maxBars)
  }

  /** The reference's complete Excel deliverable
    * (`/root/reference/Project.py:273-324`): the report sheets PLUS two
    * dedicated chart sheets (`Revenue_Chart`, `Top_Products_Chart`) with
    * the rendered PNGs embedded at A1, 0.8 scale — the images live
    * inside the workbook, not beside it. Charts render to
    * `<path>.charts/` first (kept: they double as the standalone S5
    * deliverable), then embed via the OOXML drawing parts.
    */
  def writeReportXlsx(sheets: Seq[(String, DataFrame)],
                      revenueByMonth: DataFrame, topProducts: DataFrame,
                      path: String, maxBars: Int = 500): Unit = {
    val chartsDir = s"$path.charts"
    writeCharts(revenueByMonth, topProducts, chartsDir, maxBars)
    Xlsx.writeXlsx(sheets, path, imageSheets = Seq(
      "Revenue_Chart" ->
        Xlsx.imageFromPng(s"$chartsDir/revenue_by_month.png", scale = 0.8),
      "Top_Products_Chart" ->
        Xlsx.imageFromPng(s"$chartsDir/top_products.png", scale = 0.8)))
  }
}
