package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over an event stream — the two shapes Spark
  * has no dedicated operator for (SURVEY's custom-operator candidates),
  * composed from built-ins so Catalyst keeps optimizing them:
  *
  *  - range (interval) join: equi-join on the entity key with the time
  *    range as a join predicate — the shuffle is keyed on user_id, never
  *    a cross join; the identical shape runs as a stream-stream join
  *    with watermarks bounding state (see StreamingSpec);
  *  - as-of join: "latest preceding event of kind X" via a running
  *    `last(..., ignoreNulls)` window over (ts, event_id) — one shuffle
  *    on the entity key, no self-join at all.
  */
object TemporalJoins {

  /** Click→purchase attribution: for every click, the count and value of
    * the same user's purchases within `windowMinutes` after it. Left
    * join: clicks with no attributed purchase keep n_purchases = 0 (and
    * null sum, matching SQL SUM-of-empty semantics).
    */
  def purchaseAttribution(events: DataFrame,
                          windowMinutes: Int = 30): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value"))
    clicks.join(purchases,
        clicks("user_id") === purchases("user_id") &&
          col("p_ts") > col("click_ts") &&
          col("p_ts") <= col("click_ts") +
            expr(s"INTERVAL $windowMinutes MINUTES"),
        "left")
      .groupBy(col("click_id"))
      .agg(count(col("p_ts")).as("n_purchases"),
        round(sum(col("value")), 2).as("attributed_value"))
  }

  /** As-of join within the stream: each `leftType` event paired with the
    * latest preceding `rightType` event of the same user (ties on ts
    * broken by event_id — the deterministic total order both dialects
    * share).
    */
  def asOfLast(events: DataFrame, leftType: String = "error",
               rightType: String = "signup"): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("asof_ts",
        last(when(col("event_type") === rightType, col("ts")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), col("ts").as("event_ts"),
        col("asof_ts"))
  }
}
