package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Incremental rollup: merge ≡ full rebuild, new/untouched key
  * behavior, exact decimal state.
  */
class RollupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val keys = Seq("k")
  private val measures = Seq("v")

  test("hand case: delta adds to seen keys, creates new, leaves rest") {
    val history = Seq(("a", 1.5), ("a", 2.5), ("b", 10.0)).toDF("k", "v")
    val delta = Seq(("a", 0.25), ("c", 7.0)).toDF("k", "v")
    val merged = Rollup.mergeAdditive(
      Rollup.additiveRollup(history, keys, measures),
      Rollup.additiveRollup(delta, keys, measures), keys, measures)
    val out = Rollup.report(merged, keys, measures).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out("a") == ((4.25, 1.416667, 3L)))   // touched; avg 6-dp
    assert(out("b") == ((10.0, 10.0, 1L)))       // untouched: passthrough
    assert(out("c") == ((7.0, 7.0, 1L)))         // new key from the delta
  }

  test("merge timeline equals full rebuild on the real order stream") {
    val o = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
    val cut = lit("1998-01-01").cast("timestamp")
    val ks = Seq("o_orderpriority")
    val ms = Seq("o_totalprice")
    val merged = Rollup.report(
      Rollup.mergeAdditive(
        Rollup.additiveRollup(o.filter(col("o_orderdate") < cut), ks, ms),
        Rollup.additiveRollup(o.filter(col("o_orderdate") >= cut), ks, ms),
        ks, ms), ks, ms)
    val rebuilt = Rollup.report(Rollup.additiveRollup(o, ks, ms), ks, ms)
    val a = merged.collect().map(_.toSeq).toSet
    val b = rebuilt.collect().map(_.toSeq).toSet
    assert(a == b, "incremental merge diverged from the full rebuild")
    assert(a.nonEmpty)
  }

  test("a micro-batched streaming aggregate equals the batch rollup") {
    // the x21 scaladoc claims Structured Streaming's aggregations ARE
    // this merge run continuously — pin it: stream the same rows in
    // two micro-batches through the identical agg expressions
    import org.apache.spark.sql.functions._
    val rows = Seq(("a", 1.5), ("a", 2.5), ("b", 10.0), ("c", 7.0))
    val stage = java.nio.file.Files
      .createTempDirectory("rollup_stream").toString
    rows.take(2).toDF("k", "v").write.mode("append").parquet(stage)
    rows.drop(2).toDF("k", "v").write.mode("append").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = streamIn.groupBy(col("k"))
      .agg(sum(col("v").cast("decimal(38,6)")).as("sum_v"),
        count(lit(1)).as("n_rows"))
      .writeStream.format("memory").queryName("rollup_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("rollup_stream").collect()
      .map(r => r.getString(0) ->
        ((r.getDecimal(1).doubleValue(), r.getLong(2)))).toMap
    val batch = Rollup.additiveRollup(rows.toDF("k", "v"), keys, measures)
      .collect().map(r => r.getString(0) ->
        ((r.getDecimal(1).doubleValue(), r.getLong(2)))).toMap
    assert(streamed == batch)
  }

  test("a three-way merge chain still equals the rebuild (associativity)") {
    val parts = Seq(
      Seq(("a", 1.1), ("b", 2.2)),
      Seq(("a", 3.3)),
      Seq(("b", 4.4), ("c", 5.5)))
      .map(_.toDF("k", "v"))
    val chained = parts.map(Rollup.additiveRollup(_, keys, measures))
      .reduce((s, d) => Rollup.mergeAdditive(s, d, keys, measures))
    val rebuilt = Rollup.additiveRollup(
      parts.reduce(_ unionByName _), keys, measures)
    assert(Rollup.report(chained, keys, measures).collect()
      .map(_.toSeq).toSet ==
      Rollup.report(rebuilt, keys, measures).collect().map(_.toSeq).toSet)
  }
}
