package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bucketed co-located joins: the one-time write shuffle buys
  * exchange-free joins and aggregations on the bucket key.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def withNoBroadcast[A](body: => A): A = {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("same-bucket-count join runs with zero exchanges, same result") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)
    withNoBroadcast {
      val joined =
        Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      assert(Bucketing.exchangeCount(joined) == 0,
        s"expected exchange-free plan:\n${joined.queryExecution.executedPlan}")
      val plain = orders.join(lineitem, Seq("o_orderkey"))
      assert(Bucketing.exchangeCount(plain) > 0) // the shuffle bucketing removes
      assert(joined.count() == plain.count())
      // DECIMAL sums: double addition is not associative, so the two
      // partitionings would differ in the last ulp
      def sums(df: org.apache.spark.sql.DataFrame) = df.agg(
        sum(col("l_quantity").cast("decimal(28,6)")),
        sum(col("o_totalprice").cast("decimal(28,6)"))).head()
      assert(sums(joined) == sums(plain))
    }
  }

  test("groupBy on the bucket key needs no exchange either") {
    // self-sufficient: writes its own table so the spec survives
    // filtering/reordering; bucketed scan satisfies the aggregation's
    // required distribution directly
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_li_agg", "o_orderkey", 4)
    val agg = spark.table("b_li_agg")
      .groupBy("o_orderkey").agg(sum("l_quantity"))
    assert(Bucketing.exchangeCount(agg) == 0,
      s"expected exchange-free agg:\n${agg.queryExecution.executedPlan}")
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    val part = Tables.part(spark, sfDir).select(col("p_partkey"))
    Bucketing.writeBucketed(part, "b_part8", "p_partkey", 8)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("p_partkey"))
    Bucketing.writeBucketed(li, "b_li4", "p_partkey", 4)
    withNoBroadcast {
      val joined = Bucketing.colocatedJoin(spark, "b_part8", "b_li4", "p_partkey")
      // one side re-shuffles (or both, depending on the planner's
      // choice) — correctness must not depend on co-location
      assert(joined.count() ==
        part.join(li, Seq("p_partkey")).count())
    }
  }
}
