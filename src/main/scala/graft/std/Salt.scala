package graft.std

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: two-stage salted aggregation. A hot group key (the
  * classic case here: the `"None"` fiscal-month label absorbing every
  * date-less row — SURVEY §2.4) funnels its entire group through one
  * reducer; salting spreads it over `buckets` partial groups first, then
  * combines the partials. Sums/counts re-aggregate losslessly.
  *
  * AQE's skew-join handling covers joins; this is the aggregation-side
  * counterpart for when a single *group* outweighs a partition.
  */
object Salt {

  /** Sum `valueCols` by `keys` with a salted first stage. The salt is
    * derived from row content, so same-key rows spread evenly; the
    * second stage restores exact group totals. For DOUBLE columns the
    * two-stage total can drift from a one-stage sum by summation order —
    * cast money columns to DECIMAL first (exact, associative) when the
    * result must match a single-stage computation bit-for-bit.
    *
    * `saltCols` picks which columns feed the salt hash; default is every
    * column, which maximizes spread but REFERENCES the whole schema — on
    * a wide frame that drags all columns through the scan (x1 measured
    * 3× its pruned cost before this knob). Pass a few high-cardinality
    * discriminator columns (an id, a line number) to keep the scan
    * pruned; identical rows sharing a salt only costs spread, never
    * correctness.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCols: Seq[String],
                buckets: Int = 16, saltCols: Seq[String] = Nil): DataFrame = {
    // salt from row CONTENT, not monotonically_increasing_id(): the id is
    // nondeterministic across task retries, and a re-salted recompute of
    // a map task after a fetch failure would corrupt the stage-1
    // aggregate (the SPARK-23207 class of bug). Identical rows sharing a
    // salt merely costs a little spread, never correctness.
    val saltSrc =
      (if (saltCols.nonEmpty) saltCols else df.columns.toIndexedSeq).map(col)
    val salted = df.withColumn("_salt",
      pmod(hash(saltSrc: _*), lit(buckets)))
    val stage1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(valueCols.head).as(valueCols.head),
        valueCols.tail.map(c => sum(c).as(c)): _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(sum(valueCols.head).as(valueCols.head),
        valueCols.tail.map(c => sum(c).as(c)): _*)
  }
}
