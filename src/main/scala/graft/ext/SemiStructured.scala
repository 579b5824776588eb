package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured (JSON) column handling: schema-on-read extraction
  * of typed fields from a string column.
  *
  * The extraction is `from_json` with an explicit schema — a single
  * codegen'd expression per row (no UDF, no driver parsing), which is
  * the 100 TB path: the parse happens inside whole-stage codegen
  * during the scan pass, and only the extracted (narrow, typed)
  * columns continue into the pipeline; the raw JSON string is dropped
  * at the projection. Malformed documents yield NULL fields
  * (`from_json`'s PERMISSIVE default), so one bad payload cannot fail
  * a corpus-sized job — the null count is the data-quality signal
  * ([[Validation.columnProfile]] downstream).
  */
object SemiStructured {

  /** Extract typed fields from a JSON string column: each (name, ddl
    * type) pair becomes a top-level column named `name`, read from
    * `$.name`. The JSON column itself is dropped.
    */
  def extractJson(df: DataFrame, jsonCol: String,
                  fields: Seq[(String, String)]): DataFrame = {
    require(fields.nonEmpty, "need at least one field to extract")
    val ddl = fields.map { case (n, t) => s"$n $t" }.mkString(", ")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val others = df.columns.filterNot(_ == jsonCol).map(col)
    val parsed = df.withColumn("_j", from_json(col(jsonCol), schema))
    parsed.select(others ++
      fields.map { case (n, _) => col(s"_j.$n").as(n) }: _*)
  }

  /** Per-type rollup of the extracted `k` property of the event props
    * payload (x14): the end-to-end semi-structured path — parse in the
    * scan pass, aggregate the typed field. Sums are exact longs; the
    * mean is their rounded ratio.
    */
  def propsRollup(events: DataFrame): DataFrame =
    extractJson(events, "props", Seq("k" -> "BIGINT"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        coalesce(sum(col("k")), lit(0L)).as("sum_k"),
        round(sum(col("k")).cast("double") / count(col("k")), 6)
          .as("mean_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
}
