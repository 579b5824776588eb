package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the warehouse pattern that keeps
  * a rollup table current WITHOUT rescanning history: partial
  * aggregates are mergeable, so `merge(state, rollup(delta))` equals
  * `rollup(history ∪ delta)` exactly. The reference rebuilds its
  * summary sheets from the full merged frame on every run
  * (`/root/reference/Project.py:214-235`); this is the form that
  * survives when history is 100 TB and the nightly delta is 100 GB.
  *
  * The state carries DECIMAL(38,6) sums — exact and associative, so
  * merge order (and shuffle order inside each merge) cannot move a
  * cent; doubles would drift between the incremental and rebuilt
  * timelines. Counts are longs. Derived ratios (averages) live in the
  * REPORT projection, never the state — deriving avg from merged
  * sum/count is exact; merging per-shard averages is not.
  *
  * Additive measures only (sum/count, and anything derived from them).
  * min/max merge too but do not UN-merge — a state carrying them
  * cannot absorb retractions — so they stay out of this contract.
  *
  * 100 TB shape: `additiveRollup(delta)` shuffles only the delta;
  * the merge unions |affected keys| state rows with |delta keys|
  * partials and re-aggregates — O(batch + keys), never O(history).
  * Structured Streaming's windowed aggregations are this same merge
  * run continuously; [[graft.streaming.StreamingOps]] pins those.
  */
object Rollup {

  /** Mergeable rollup state of `df`: per `keys`, DECIMAL(38,6)
    * `sum_<m>` for each measure and a `n_rows` count.
    */
  def additiveRollup(df: DataFrame, keys: Seq[String],
                     measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one grouping key")
    require(measures.nonEmpty, "need at least one measure")
    val aggs = measures.map(m =>
      sum(col(m).cast("decimal(38,6)")).as(s"sum_$m")) :+
      count(lit(1)).as("n_rows")
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge a delta's rollup into the standing state:
    * `mergeAdditive(state, additiveRollup(delta, ...), ...)` ≡
    * `additiveRollup(history ∪ delta, ...)` (spec-pinned). Keys new to
    * the delta appear; keys absent from it pass through untouched.
    */
  def mergeAdditive(state: DataFrame, deltaRollup: DataFrame,
                    keys: Seq[String], measures: Seq[String]): DataFrame = {
    val aggs = measures.map(m =>
      sum(col(s"sum_$m")).as(s"sum_$m")) :+
      sum(col("n_rows")).as("n_rows")
    state.unionByName(deltaRollup)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Human-facing projection of a rollup state: 6-dp double sums and
    * exact-ratio averages, derived from the merged totals.
    */
  def report(state: DataFrame, keys: Seq[String],
             measures: Seq[String]): DataFrame = {
    val cols = keys.map(col) ++ measures.flatMap(m => Seq(
      round(col(s"sum_$m"), 6).cast("double").as(s"sum_$m"),
      round(col(s"sum_$m").cast("double") / col("n_rows"), 6)
        .as(s"avg_$m"))) :+ col("n_rows")
    state.select(cols: _*)
  }
}
