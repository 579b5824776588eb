package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Storage-layout operators — the other half of the write-time-work
  * story next to [[Bucketing]]: bucketing kills the JOIN shuffle,
  * partition + sort layout kills the SCAN. At 100 TB the difference
  * between "read 100 TB and filter" and "read the 3 partitions the
  * predicate selects" is the whole query budget, and it is decided
  * entirely by how the data was written.
  *
  *  - [[writePartitioned]]: Hive-style directory partitioning on a
  *    low-cardinality key (date, language, source). A filter on the
  *    partition column becomes a `PartitionFilters` entry — pruned at
  *    PLANNING time from the file listing; unselected partitions are
  *    never opened, never even stat'ed into the scan.
  *  - [[writeRangeSorted]]: range-repartition + in-file sort on a
  *    high-cardinality key. Every file then covers a disjoint key
  *    range, so parquet footer min/max statistics let pushed-down
  *    range predicates skip whole files/row-groups — the poor man's
  *    Z-order, right for the one-dimensional sort keys that dominate
  *    (time, id).
  *
  * The assertion helpers see through the AQE wrapper like
  * [[Bucketing.exchangeCount]] — a plain `collect` on the executed plan
  * reports nothing.
  */
object Layout {

  /** Hive-style partitioned parquet write. Partition values become
    * directory names, so keep cardinality bounded (dates, languages —
    * not user ids: a million directories IS the anti-pattern this
    * API's scaladoc exists to warn about).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Range-partitioned, within-file-sorted parquet write: `numFiles`
    * files with disjoint, sorted key ranges (min/max footer stats
    * become selective).
    */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String,
                       numFiles: Int): Unit = {
    require(numFiles >= 1, "need at least one output file")
    df.repartitionByRange(numFiles, df(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-ordered parquet write: bit-interleaved multi-dimensional
    * clustering, for the workloads [[writeRangeSorted]] can't serve —
    * a linear sort on `x` leaves every file spanning the FULL range of
    * `y`, so `y` predicates skip nothing. Interleaving the dimensions'
    * bits makes each file a small hyper-rectangle in (x, y, ...) space:
    * footer min/max stats become selective on EVERY z-dimension at
    * once (at modest per-dimension resolution — the classic Z-order
    * trade, same as Delta/Iceberg's OPTIMIZE ZORDER).
    *
    * Mechanics: each (numeric) column is scaled to a `bits`-wide
    * bucket via its global min/max (ONE tiny aggregate — the only
    * driver-side data, 2 scalars per column), buckets are bit-
    * interleaved into a single long, and the write range-partitions +
    * sorts on that z-value (`repartitionByRange` samples, so no global
    * sort). NULLs bucket to 0 — they cluster at the z-origin instead
    * of spraying across files.
    *
    * 100 TB shape: scan → per-row arithmetic → one range exchange on
    * the z long. The min/max aggregate is a second scan of only the z
    * columns (column-pruned); pass `stats` to skip it when the bounds
    * are known (e.g. from table metadata).
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    numFiles: Int, bits: Int = 8,
                    stats: Option[Map[String, (Double, Double)]] = None)
      : Unit = {
    import org.apache.spark.sql.functions._
    require(zCols.size >= 2, "z-order needs at least two dimensions")
    require(numFiles >= 1, "need at least one output file")
    require(bits >= 1 && bits * zCols.size <= 62,
      s"bits*dims must fit a long, got $bits*${zCols.size}")
    val bounds: Map[String, (Double, Double)] = stats.getOrElse {
      val aggs = zCols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"_min_$c"),
        max(col(c).cast("double")).as(s"_max_$c")))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      zCols.map(c => c -> ((r.getAs[Double](s"_min_$c"),
        r.getAs[Double](s"_max_$c")))).toMap
    }
    val nBuckets = 1L << bits
    val buckets = zCols.map { c =>
      val (lo, hi) = bounds(c)
      val span = if (hi > lo) hi - lo else 1.0
      least(
        greatest(floor((coalesce(col(c).cast("double"), lit(lo)) - lo)
          / span * nBuckets), lit(0L)),
        lit(nBuckets - 1)).cast("long")
    }
    val n = buckets.size
    var z: Column = lit(0L)
    for (i <- 0 until bits; j <- 0 until n) {
      val bit = shiftright(buckets(j), i).bitwiseAND(lit(1L))
      z = z.bitwiseOR(shiftleft(bit, i * n + (n - 1 - j)))
    }
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file report for a parquet directory: file count, total
    * bytes, and how many files sit under `smallBytes` — the listing a
    * compaction policy triggers on. Driver-side file metadata only
    * (the same listing a scan does); no data job runs.
    */
  def fileReport(spark: SparkSession, path: String,
                 smallBytes: Long = 32L << 20): (Long, Long, Long) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (files.length.toLong, files.map(_.getLen).sum,
      files.count(_.getLen < smallBytes).toLong)
  }

  /** Compact a parquet directory to ~`targetBytes` files (x28's op —
    * the small-files problem is THE silent 100-TB scan killer: a
    * million 1 MB files costs a million open/footer/close round trips
    * and a million-entry listing before byte one). Rewrites to
    * `ceil(total / targetBytes)` files via a round-robin repartition
    * (no key skew — this is layout, not clustering; use
    * [[writeRangeSorted]] / [[writeZOrdered]] when the rewrite should
    * also SORT) into a sibling temp dir, then swaps atomically-enough
    * for a batch pipeline (rename after successful write).
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20): (Long, Long) = {
    require(targetBytes >= (1L << 20),
      "target below 1 MiB is not compaction")
    val (nBefore, totalBytes, _) = fileReport(spark, path, targetBytes)
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
    val df = spark.read.parquet(path)
    val tmp = path.stripSuffix("/") + "_compact_tmp"
    df.repartition(nFiles.toInt).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path))
    val (nAfter, _, _) = fileReport(spark, path, targetBytes)
    (nBefore, nAfter)
  }

  /** The scan's partition filters (pretty-printed) — non-empty proves
    * the predicate reached the file listing instead of a post-scan
    * Filter node.
    */
  def partitionFilters(df: DataFrame): Seq[String] =
    scans(df).flatMap(_.partitionFilters.map(_.sql))

  /** Data filters pushed into the parquet reader (footer-stats
    * pruning + row-group skipping operate on these).
    */
  def pushedFilters(df: DataFrame): Seq[String] =
    scans(df).flatMap(_.dataFilters.map(_.sql))

  /** Files the frame's scans will read, from the PRUNED file listing
    * (`location.listFiles(partitionFilters, dataFilters)` — the same
    * call the scan's RDD construction makes). Computed at planning
    * time: no action needed, and unlike the scan's `numFiles` metric
    * it cannot be confused by `df.count()` building its own separate
    * QueryExecution.
    */
  def filesRead(df: DataFrame): Long =
    scans(df).map(s =>
      s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
        .map(_.files.size.toLong).sum).sum

  private def scans(df: DataFrame)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    graft.std.Plans.collect(df) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
}
