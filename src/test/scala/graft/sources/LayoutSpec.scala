package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Storage layout: partition pruning and sorted-file filter pushdown
  * are write-time decisions, asserted on the read plans.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("partitioned write prunes unselected partitions at planning time") {
    val events = Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
    val path = Files.createTempDirectory("layout_part").toString
    Layout.writePartitioned(events, path, Seq("event_date"))
    val nDates = events.select("event_date").distinct().count()
    assert(nDates > 3) // the prune below must have something to prune

    val all = spark.read.parquet(path)
    val oneDate = all.select(min(col("event_date"))).head().getDate(0)
    val pruned = all.filter(col("event_date") === lit(oneDate))
    val got = pruned.count()

    assert(Layout.partitionFilters(pruned).nonEmpty,
      "date predicate did not reach the partition listing")
    assert(Layout.filesRead(pruned) < Layout.filesRead(all),
      "pruned scan reads as many files as the full scan")
    val expected = events.filter(col("event_date") === lit(oneDate)).count()
    assert(got == expected)
  }

  test("range-sorted write pushes range predicates to the reader") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
    val path = Files.createTempDirectory("layout_range").toString
    Layout.writeRangeSorted(li, path, "l_orderkey", 8)

    val maxKey = li.agg(max("l_orderkey")).head().getLong(0)
    val scan = spark.read.parquet(path)
      .filter(col("l_orderkey") <= maxKey / 100)
    val got = scan.count()
    // the range predicate must reach the parquet reader, where the
    // disjoint per-file min/max ranges this writer produced make it
    // selective (row-group skipping is a reader metric, not a plan
    // node — pushdown + correctness are the assertable contract)
    assert(Layout.pushedFilters(scan).exists(_.contains("l_orderkey")),
      "range predicate not pushed to the scan")
    assert(got == li.filter(col("l_orderkey") <= maxKey / 100).count())
  }
}
