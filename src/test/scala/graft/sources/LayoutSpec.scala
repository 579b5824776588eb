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

  test("z-order clusters BOTH dimensions; linear sort only one") {
    import spark.implicits._
    // a 64x64 grid: under a linear sort on x, every file spans all of
    // y; under z-order every file is a small (x, y) rectangle
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toDouble, y.toDouble)).toDF("x", "y")
    val nFiles = 16

    def meanSpan(path: String, dim: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(dim)) - min(col(dim))).as("span"))
      perFile.agg(avg("span")).head().getDouble(0)
    }

    val zPath = Files.createTempDirectory("layout_z").toString
    Layout.writeZOrdered(grid, zPath, Seq("x", "y"), nFiles)
    val linPath = Files.createTempDirectory("layout_lin").toString
    Layout.writeRangeSorted(grid, linPath, "x", nFiles)

    // linear layout: x clusters, y spans the whole 0..63 range per file
    assert(meanSpan(linPath, "x") < 16.0)
    assert(meanSpan(linPath, "y") > 60.0)
    // z-order: BOTH dims confined to a fraction of their global span —
    // this per-file min/max narrowing is exactly what parquet footer
    // stats expose to the reader's range-predicate skipping
    assert(meanSpan(zPath, "x") < 32.0,
      s"x span ${meanSpan(zPath, "x")} not clustered")
    assert(meanSpan(zPath, "y") < 32.0,
      s"y span ${meanSpan(zPath, "y")} not clustered")
    // nothing lost in the rewrite
    assert(spark.read.parquet(zPath).count() == 64L * 64L)
  }

  test("z-order write: nulls cluster at origin, bounds can be supplied") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (null, 5.0), (1.0, 1.0), (9.0, 9.0)).toDF("x", "y")
    val path = Files.createTempDirectory("layout_znull").toString
    Layout.writeZOrdered(df, path, Seq("x", "y"), 1,
      stats = Some(Map("x" -> ((0.0, 10.0)), "y" -> ((0.0, 10.0)))))
    val back = spark.read.parquet(path).collect()
    assert(back.length == 3) // null row survives the rewrite
    assert(back.count(_.isNullAt(0)) == 1)
  }

  test("compaction collapses a small-file explosion, data intact") {
    import spark.implicits._
    val path = Files.createTempDirectory("layout_compact").toString
    // 64 tiny files — the scan-killer layout
    (1L to 2048L).map(i => (i, s"row$i")).toDF("id", "payload")
      .repartition(64).write.mode("overwrite").parquet(path)
    val (before, bytes, small) = Layout.fileReport(spark, path)
    assert(before == 64 && small == 64 && bytes > 0)
    // target sized so the rewrite lands on a handful of files
    val (nBefore, nAfter) = Layout.compact(spark, path,
      targetBytes = math.max(1L << 20, bytes / 4))
    assert(nBefore == 64 && nAfter <= 4, s"still $nAfter files")
    val back = spark.read.parquet(path)
    assert(back.count() == 2048)
    assert(back.agg(sum("id")).head().getLong(0) == 2048L * 2049 / 2)
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
