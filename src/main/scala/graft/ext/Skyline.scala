package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the multi-objective shortlist
  * query: cheapest-for-the-size parts, best-quality-for-the-length
  * documents, fastest-for-the-recall ANN configs. A row survives iff
  * no other row is at least as good on both axes and strictly better
  * on one.
  *
  * 100 TB shape: the textbook definition is a quadratic self-join
  * (`NOT EXISTS` dominance probe — exactly what the oracle twin runs);
  * the scale path here is sort-free-of-self-join: collapse to one row
  * per distinct minimize-value (that group's best maximize-value),
  * take an EXCLUSIVE prefix max over the minimize order — computed
  * two-level like [[graft.std.PrefixSum]], so the only global window
  * touches one row per bucket — and keep the rows whose maximize
  * value beats every strictly-cheaper group's best. One groupBy
  * shuffle on the minimize column plus a broadcast join back; nothing
  * quadratic anywhere.
  *
  * Determinism: pure comparisons on stored values — no arithmetic is
  * performed at all, so there is nothing to round.
  */
object Skyline {

  /** Rows of `df` on the Pareto frontier of (minimize `minCol`,
    * maximize `maxCol`). `bucketOf` maps the minimize column to a
    * bucket id and must be MONOTONE in it (equal values land in the
    * same bucket — automatic for shapes like `floor(_ / k)`); it only
    * shapes parallelism, never the result. Rows with a null objective
    * are excluded — dominance is undefined for them.
    *
    * Duplicate points survive together (neither strictly dominates its
    * twin), matching the SQL dominance definition.
    */
  def paretoFront(df: DataFrame, minCol: String, maxCol: String,
                  bucketOf: Column => Column): DataFrame = {
    val pts = df.filter(col(minCol).isNotNull && col(maxCol).isNotNull)
    // one row per distinct minimize-value: that price point's best
    val collapsed = pts.groupBy(col(minCol).as("_m"))
      .agg(max(col(maxCol)).as("_best"))
      .withColumn("_bucket", bucketOf(col("_m")).cast("long"))
    // exclusive prefix max, two-level: within-bucket window over the
    // (distinct, hence tie-free) _m order, then |buckets| offsets take
    // the only global window
    val inBucket = Window.partitionBy(col("_bucket")).orderBy(col("_m"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = collapsed.withColumn("_prev_local",
      max(col("_best")).over(inBucket))
    val offsets = collapsed.groupBy(col("_bucket"))
      .agg(max(col("_best")).as("_bmax"))
      .withColumn("_prev_bucket",
        max(col("_bmax")).over(Window.orderBy(col("_bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_bucket"), col("_prev_bucket"))
    // greatest() skips nulls: null only when NO strictly-cheaper group
    // exists at all (the global minimum's group)
    val front = local.join(broadcast(offsets), Seq("_bucket"))
      .withColumn("_prev_best",
        greatest(col("_prev_local"), col("_prev_bucket")))
      .filter(col("_prev_best").isNull || col("_prev_best") < col("_best"))
      .select(col("_m"), col("_best"))
    // within a frontier price group only the best-max rows survive
    // (a smaller max at the same min is dominated by its own group)
    pts.join(broadcast(front),
        pts(minCol) === front("_m") && pts(maxCol) === front("_best"))
      .drop("_m", "_best")
  }
}
