package graft.std

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The two-level prefix sum must equal the flat global window it
  * replaces — on every input shape that exercises a seam: bucket
  * boundaries, ties within and across peers, negative deltas.
  */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flat(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("running",
      sum(col("delta")).over(Window.orderBy(col("k"), col("delta"))))

  private def twoLevel(df: org.apache.spark.sql.DataFrame) =
    PrefixSum.runningSum(df, (col("k") / 10).cast("long"),
      Seq(col("k"), col("delta")), col("delta"))

  test("differential: equals the flat global window across buckets") {
    // keys 0..99 in 10 buckets, deltas oscillating sign, some keys
    // repeated (peer groups), some buckets empty (k skips 30-39)
    val rows = (0 to 99).filterNot(k => k >= 30 && k < 40).flatMap { k =>
      val d = if (k % 3 == 0) -1L else (k % 5).toLong
      if (k % 7 == 0) Seq((k, d), (k, d)) else Seq((k, d))
    }
    val df = rows.toDF("k", "delta")
    val a = flat(df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    val b = twoLevel(df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("ties merge as RANGE peers: equal keys share one running value") {
    val df = Seq((1, 1L), (1, 1L), (1, 1L), (2, 1L)).toDF("k", "delta")
    val r = twoLevel(df).collect().map(r => r.getInt(0) -> r.getLong(2))
    // all three k=1 rows are peers: each sees the full peer-group sum 3
    assert(r.filter(_._1 == 1).map(_._2).toSet == Set(3L))
    assert(r.filter(_._1 == 2).map(_._2).toSet == Set(4L))
  }

  test("the fact-side window is partitioned; only the offset frame is global") {
    val df = (0 to 999).map(k => (k, 1L)).toDF("k", "delta")
    val specs = twoLevel(df).queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.size
    }
    // exactly two Window nodes: the bucket-partitioned row-level one
    // and the |buckets|-row unpartitioned offset frame
    assert(specs.sorted == Seq(0, 1),
      s"expected one bucketed + one global-offset window, got partition-spec sizes $specs")
  }

  test("range-bucketed form equals the flat window on data the hour " +
    "bucket would collapse; split adapts to the skew") {
    // 2000 keys packed into ONE coarse-bucket's worth of key space:
    // a time-grain bucket expression puts everything in one bucket
    // (the one-partition window the primitive exists to avoid); the
    // range partitioner samples the real distribution and splits
    // anyway
    val rows = (0 until 2000).map(k => (k % 50, if (k % 2 == 0) 1L
      else -1L))
    val df = rows.toDF("k", "delta")
    val a = flat(df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    val b = PrefixSum.runningSumRange(df,
        Seq(col("k"), col("delta")), col("delta"), 8)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq)
    // the skew guard itself: the range split actually spreads the
    // packed keys across partitions (>1), where a single coarse
    // bucket could not
    val parts = df.repartitionByRange(8, col("k"), col("delta"))
      .rdd.getNumPartitions
    assert(parts > 1, s"range split must spread skewed keys: $parts")
  }

  test("single bucket degenerates gracefully; empty input stays empty") {
    val one = Seq((1, 5L), (2, -3L)).toDF("k", "delta")
    val r = PrefixSum.runningSum(one, lit(0L), Seq(col("k")), col("delta"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(r == Map(1 -> 5L, 2 -> 2L))
    val empty = Seq.empty[(Int, Long)].toDF("k", "delta")
    assert(twoLevel(empty).collect().isEmpty)
  }
}
