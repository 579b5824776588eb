package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.std.SchemaOps

/** The reference's BI aggregations (SURVEY §2.5–2.7;
  * `/root/reference/Project.py:166-329`) over the cleaned merged frame.
  *
  * Oracle-parity conventions (FIXTURES.md §4): every double aggregate is
  * rounded (2 dp for money, 6 dp for ratios) so partial-aggregation
  * summation order can't flip the hash compare; every top-k carries a
  * deterministic tiebreaker (pandas' unstable quicksort makes the
  * reference's rank-15 ties nondeterministic — SURVEY §2.5 Q2).
  */
object BiQueries {

  /** Q1 + Q1b one-pass form (`Project.py:181-190`): revenue and gross
    * margin by financial month. The reference computes two groupbys and
    * inner-joins them; both sides share identical key sets so a single
    * aggregate is semantically identical — and one shuffle instead of three.
    */
  def revenueByMonth(df: DataFrame): DataFrame =
    df.groupBy(col("fin_month_label"))
      .agg(sum("total_line_price").as("_rev"), sum("gross_margin").as("_gm"))
      .select(
        col("fin_month_label"),
        round(col("_rev"), 2).as("revenue"),
        round(col("_gm"), 2).as("gross_margin"),
        round(when(abs(col("_rev")) > 1e-9, col("_gm") / col("_rev")), 6)
          .as("gm_pct"))

  /** Q1b literal join form (`Project.py:187-190`) — kept as the operator
    * demonstration of the reference's one join: two aggregates of the same
    * table inner-joined on the label. At aggregate cardinality (#months)
    * Catalyst broadcasts this join automatically.
    */
  def revenueByMonthJoined(df: DataFrame): DataFrame = {
    val rev = df.groupBy(col("fin_month_label"))
      .agg(sum("total_line_price").as("revenue"))
    val gm = df.groupBy(col("fin_month_label"))
      .agg(sum("gross_margin").as("gross_margin"))
    rev.join(gm, Seq("fin_month_label"), "inner")
      .select(
        col("fin_month_label"),
        round(col("revenue"), 2).as("revenue"),
        round(col("gross_margin"), 2).as("gross_margin"),
        round(when(abs(col("revenue")) > 1e-9,
          col("gross_margin") / col("revenue")), 6).as("gm_pct"))
  }

  /** Q2 — top-k products by revenue (`Project.py:193-202`), P7-resolved
    * product column, P13 display name. `orderBy(...).limit(k)` plans as
    * `TakeOrderedAndProject`: a per-partition heap, no global sort.
    */
  def topProducts(df: DataFrame, k: Int = 15): DataFrame = {
    val p = SchemaOps.findProductColumn(df.columns.toIndexedSeq)
      .getOrElse(sys.error("no product column resolved"))
    df.groupBy(col(p).as("product_desc"))
      .agg(sum("total_line_price").as("_rev"))
      // rank on the rounded sum so the deterministic tiebreaker engages
      // whenever 2-dp revenues tie (partial-agg summation order can differ
      // from the oracle's by less than the float error)
      .orderBy(round(col("_rev"), 2).desc, col("product_desc").asc)
      .limit(k)
      .select(
        col("product_desc"),
        round(col("_rev"), 2).as("revenue"),
        concat(substring(col("product_desc"), 1, 30), lit("..."))
          .as("product_short"))
  }

  /** Q3 — revenue + units by financial month × region × brand
    * (`Project.py:211-217`), P7-resolved dimension columns.
    */
  def salesByRegionBrand(df: DataFrame): DataFrame = {
    val cols = df.columns.toIndexedSeq
    val region = SchemaOps.findRegionColumn(cols).getOrElse(sys.error("no region column"))
    val brand = SchemaOps.findBrandColumn(cols).getOrElse(sys.error("no brand column"))
    df.groupBy(col("fin_month_label"), col(region).as("region_desc"), col(brand).as("brand_desc"))
      .agg(sum("total_line_price").as("_rev"), sum("quantity").as("_units"))
      .select(
        col("fin_month_label"), col("region_desc"), col("brand_desc"),
        round(col("_rev"), 2).as("revenue"),
        round(col("_units"), 2).as("units"))
  }

  /** Q4 — AR aging totals by financial month × region
    * (`Project.py:220-224`).
    */
  def arByRegion(df: DataFrame): DataFrame = {
    val region = SchemaOps.findRegionColumn(df.columns.toIndexedSeq)
      .getOrElse(sys.error("no region column"))
    df.groupBy(col("fin_month_label"), col(region).as("region_desc"))
      .agg(sum("total_due").as("_ar"))
      .select(col("fin_month_label"), col("region_desc"),
        round(col("_ar"), 2).as("ar_total"))
  }

  /** Q5 — summary scalars (`Project.py:276-287,407-418`): one global
    * aggregate; flag counts are the reference's boolean sums.
    */
  def summary(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).as("total_rows"),
      min("event_date").as("date_min"),
      max("event_date").as("date_max"),
      round(sum("total_line_price"), 2).as("total_revenue"),
      countDistinct("fin_month_label").as("fin_months"),
      sum(when(col("flag_negative_qty"), 1L).otherwise(0L)).as("neg_qty_rows"),
      sum(when(col("flag_negative_price"), 1L).otherwise(0L)).as("neg_price_rows"),
      sum(when(col("flag_zero_price_nonzero_qty"), 1L).otherwise(0L)).as("zero_price_rows"))

  /** The five TPC-H region names — the pivot column set. Passing the
    * values explicitly matters twice over: it skips the
    * distinct-values-collect job Spark otherwise runs before pivoting,
    * and it makes the output schema static (a 100-TB pivot whose column
    * set depends on a full scan of the data is a two-pass query with an
    * unpredictable schema).
    */
  val RegionPivotValues: Seq[String] =
    Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")

  /** Pivot — revenue by fiscal month, one column per region (the
    * cross-tab every BI dashboard draws from Q3's long form). Plans as a
    * single hash aggregate over `fin_month_label` with one conditional
    * sum per region: one shuffle, same cost as Q1.
    */
  def revenuePivotByRegion(df: DataFrame): DataFrame = {
    val region = SchemaOps.findRegionColumn(df.columns.toIndexedSeq)
      .getOrElse(sys.error("no region column"))
    df.groupBy(col("fin_month_label"))
      .pivot(region, RegionPivotValues)
      .agg(round(sum("total_line_price"), 2))
      .select(col("fin_month_label") +: RegionPivotValues.map(r =>
        col(s"`$r`").as(r.toLowerCase.replace(' ', '_'))): _*)
  }

  /** Unpivot — melt the region cross-tab back to long form
    * (fin_month_label, region_key, revenue), dropping the null cells the
    * pivot introduced for absent (month, region) combos. Round-trips
    * with [[revenuePivotByRegion]]; `Dataset.unpivot` is a zero-shuffle
    * generator over the wide frame.
    */
  def revenueUnpivotByRegion(df: DataFrame): DataFrame = {
    val wide = revenuePivotByRegion(df)
    val valueCols = wide.columns.filterNot(_ == "fin_month_label")
    wide.unpivot(Array(col("fin_month_label")), valueCols.map(col),
        "region_key", "revenue")
      .filter(col("revenue").isNotNull)
  }

  /** P12 — quality-issue rows (`Project.py:307-309`). The reference takes
    * `head(1000)` (row identity nondeterministic); the oracle-checkable form
    * aggregates the filtered set instead (SURVEY §2.7).
    */
  def qualityIssueCounts(df: DataFrame): DataFrame =
    df.filter(col("flag_negative_qty") || col("flag_negative_price") ||
        col("flag_zero_price_nonzero_qty"))
      .groupBy(col("flag_negative_qty"), col("flag_negative_price"),
        col("flag_zero_price_nonzero_qty"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum("total_line_price"), 2).as("sum_price"))
}
