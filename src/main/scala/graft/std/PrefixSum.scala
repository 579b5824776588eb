package graft.std

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running sum — the primitive behind sweep-line
  * analytics (concurrency curves, running balances, cumulative
  * distributions over a global order).
  *
  * The naive form — `sum(x) OVER (ORDER BY ts)` with no PARTITION BY —
  * is the single worst scaling trap in window analytics: Spark plans it
  * as ONE partition holding the entire fact table (it even warns
  * "No Partition Defined for Window operation"), so at 100 TB the job
  * is a one-task sort. This primitive is the textbook two-level
  * decomposition:
  *
  *  1. rows get a BUCKET from a caller-supplied expression over the
  *     leading order column (hour-of-timestamp, id-range, ...); the
  *     running sum within each bucket is an ordinary partitioned
  *     window — parallel across buckets;
  *  2. per-bucket TOTALS (|buckets| rows — thousands, not billions)
  *     take the only global window, producing each bucket's exclusive
  *     prefix offset; the offsets broadcast-join back and add.
  *
  * The global sort that remains touches one row per bucket, which is
  * the part of the problem that actually fits on one core. Correctness
  * requires only that the bucket expression be MONOTONE in the order
  * key (equal order keys land in the same bucket — automatic when the
  * bucket derives from the leading order column, e.g. `date_trunc`).
  *
  * Tie discipline: the within-bucket window uses the default RANGE
  * UNBOUNDED PRECEDING .. CURRENT ROW frame, so rows equal on the FULL
  * order key sum as one peer group — the running value is order-free
  * under ties, which is what makes it oracle-comparable (both engines
  * share the default frame).
  */
object PrefixSum {

  /** Append `running` = the global RANGE-framed running sum of `value`
    * over `order`, computed without any full-table single-partition
    * window. `bucket` must be monotone in the leading order column.
    */
  def runningSum(df: DataFrame, bucket: Column, order: Seq[Column],
                 value: Column): DataFrame = {
    val withB = df.withColumn("_bucket", bucket)
      .withColumn("_v", value.cast("long"))
    val inBucket = Window.partitionBy(col("_bucket"))
      .orderBy(order: _*)
    val local = withB.withColumn("_run_local",
      sum(col("_v")).over(inBucket))
    // |buckets| rows: the one global window, on the frame that stays
    // tiny by construction (document the bucket grain at the call site)
    val offsets = withB.groupBy(col("_bucket"))
      .agg(sum(col("_v")).as("_total"))
      .withColumn("_offset",
        coalesce(sum(col("_total")).over(
          Window.orderBy(col("_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bucket"), col("_offset"))
    local.join(broadcast(offsets), Seq("_bucket"))
      .withColumn("running", col("_offset") + col("_run_local"))
      .drop("_bucket", "_v", "_run_local", "_offset")
  }

  /** [[runningSum]] with SKEW-ADAPTIVE buckets: instead of a
    * caller-supplied expression over the order column (whose grain is
    * a bet on the data's spread — an hour bucket degrades toward the
    * one-partition window exactly when the corpus concentrates into
    * few hours), rows are `repartitionByRange`d on the order key and
    * the PARTITION ID becomes the bucket. The range partitioner
    * samples the actual distribution, so boundaries adapt: a corpus
    * packed into one hour still splits into ~`buckets` even slices.
    *
    * Why this preserves the contract: range partitions are contiguous
    * in the order key, so partition id is MONOTONE in it, and rows
    * equal on the full order key land in one partition — the two
    * properties [[runningSum]] needs. The RUNNING VALUES are
    * bucket-split-invariant (any monotone tie-respecting split gives
    * the same prefix sums), so the output — and the oracle — are
    * unchanged even though the sampled boundaries themselves are not
    * deterministic. AQE may coalesce adjacent range partitions;
    * adjacency keeps both properties.
    */
  def runningSumRange(df: DataFrame, order: Seq[Column], value: Column,
                      buckets: Int): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    val parted = df.repartitionByRange(buckets, order: _*)
    runningSum(parted, spark_partition_id(), order, value)
  }
}
