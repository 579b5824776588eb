package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Market-basket association mining — the co-occurrence tier of the
  * analytics stack: which items sell together (cross-sell), which
  * domains co-cite (crawl families), which tokens co-occur (topic
  * hints). The output is the classic (support, confidence, lift)
  * triple per item pair.
  *
  * 100 TB shape: the Apriori anti-monotone property does the heavy
  * lifting BEFORE anything quadratic happens — an item pair can only
  * clear `minPairCount` if both items individually do, so the basket
  * frame is cut to frequent items first and pair generation runs on
  * the reduced frame. Pair explosion is bounded per basket (k items →
  * k·(k−1)/2 pairs, and real baskets are small); the one wide shuffle
  * carries (item_a, item_b) pairs as two longs, never basket
  * payloads. Item counts and the basket total are tiny aggregates.
  *
  * Determinism: all counts are exact integers; every ratio is emitted
  * in 1e-9 fixed point via truncating integer division on DECIMAL(38)
  * products (the x31 lcc device — positive operands make Spark's
  * `div` and DuckDB's `//` the same integer), the double forms being
  * display-only divisions of identical longs.
  */
object Basket {

  /** Association rules over a basket/item frame.
    *
    * `baskets` must carry `basketCol` (basket id) and `itemCol` (item
    * id, long-compatible); duplicates within a basket collapse.
    * `minItemCount` prunes infrequent items before pair generation
    * (the Apriori cut); `minPairCount` bounds the emitted pair set.
    *
    * Returns one row per qualifying unordered pair (item_a < item_b):
    * (item_a, item_b, n_a, n_b, n_ab, support_e9, support, conf_ab_e9,
    * conf_ab, conf_ba_e9, conf_ba, lift_e9, lift) where
    * support = n_ab / N baskets, conf_ab = P(b | a) = n_ab / n_a, and
    * lift = n_ab·N / (n_a·n_b) — lift > 1 means the pair co-occurs
    * more than independence predicts.
    */
  def associationRules(baskets: DataFrame, basketCol: String,
                       itemCol: String, minItemCount: Long = 2L,
                       minPairCount: Long = 2L): DataFrame = {
    require(minItemCount >= 1 && minPairCount >= 1,
      "support thresholds must be >= 1")
    val items = graft.std.Materialize.once(
      baskets.select(col(basketCol).as("b"),
          col(itemCol).cast("long").as("i"))
        .filter(col("b").isNotNull && col("i").isNotNull)
        .distinct())
    // one long to the driver: the basket universe size (the support
    // denominator); everything else stays distributed
    val nBaskets = items.select(countDistinct(col("b")).as("n"))
      .collect()(0).getLong(0)
    val schema = StructType(Seq(
      StructField("item_a", LongType), StructField("item_b", LongType),
      StructField("n_a", LongType), StructField("n_b", LongType),
      StructField("n_ab", LongType),
      StructField("support_e9", LongType),
      StructField("support", DoubleType),
      StructField("conf_ab_e9", LongType),
      StructField("conf_ab", DoubleType),
      StructField("conf_ba_e9", LongType),
      StructField("conf_ba", DoubleType),
      StructField("lift_e9", LongType), StructField("lift", DoubleType)))
    if (nBaskets == 0L)
      return baskets.sparkSession.createDataFrame(
        baskets.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
    val itemCounts = graft.std.Materialize.once(
      items.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
        .filter(col("n_i") >= minItemCount))
    // Apriori cut: only frequent items enter pair generation
    val freq = items.join(itemCounts.select(col("i")), Seq("i"))
    val pairs = freq.select(col("b"), col("i").as("item_a"))
      .join(freq.select(col("b"), col("i").as("item_b")), Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(itemCounts.select(col("i").as("item_a"), col("n_i").as("n_a")),
        Seq("item_a"))
      .join(itemCounts.select(col("i").as("item_b"), col("n_i").as("n_b")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * 1000000000 " +
          s"div $nBaskets AS BIGINT)").as("support_e9"),
        expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * 1000000000 " +
          "div n_a AS BIGINT)").as("conf_ab_e9"),
        expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * 1000000000 " +
          "div n_b AS BIGINT)").as("conf_ba_e9"),
        expr(s"CAST(CAST(n_ab AS DECIMAL(38,0)) * $nBaskets " +
          "* 1000000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b) " +
          "AS BIGINT)").as("lift_e9"))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        col("support_e9"),
        (col("support_e9").cast("double") / lit(1e9)).as("support"),
        col("conf_ab_e9"),
        (col("conf_ab_e9").cast("double") / lit(1e9)).as("conf_ab"),
        col("conf_ba_e9"),
        (col("conf_ba_e9").cast("double") / lit(1e9)).as("conf_ba"),
        col("lift_e9"),
        (col("lift_e9").cast("double") / lit(1e9)).as("lift"))
  }
}
