package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: pre-shuffle a fact table ONCE at write
  * time so every later equi-join or aggregation on the bucket key runs
  * shuffle-free. This is the 100 TB answer to the repeated-join-key
  * problem — at cluster scale the shuffle of a 100 TB fact table is the
  * single most expensive operation a plan can contain, and bucketing
  * amortizes it across every downstream query that joins or groups on
  * the same key. (The reference re-reads its flat file per run and has
  * no layout concept; this is part of the beyond-reference scale tier.)
  *
  * Mechanics: `bucketBy(n, key)` hash-partitions rows into `n` buckets
  * per writer task using Spark's Murmur3 — the SAME hash the shuffle
  * exchange uses, which is why a bucketed scan satisfies
  * `HashPartitioning(key, n)` and the planner drops the Exchange on
  * both sides of a same-bucket-count join. `sortBy(key)` additionally
  * records per-file sort order, letting sort-merge join skip its Sort
  * when each bucket holds one file.
  *
  * Local caveat baked into [[writeBucketed]]: one file per bucket
  * requires one writer task per bucket, so the frame is repartitioned
  * by the bucket key first (at cluster scale that repartition IS the
  * one-time shuffle being amortized; without it every input task writes
  * a file into every bucket and small files explode).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table in the
    * session catalog/warehouse.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    require(buckets > 0, "bucket count must be positive")
    df.repartition(buckets, df(key))
      .write.format("parquet").mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Inner-join two same-bucketed tables on their bucket key. The plan
    * is the point: both scans report the bucket `HashPartitioning`, so
    * the join has NO Exchange on either side (assert with
    * [[exchangeCount]] — the spec does).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Number of shuffle exchanges in a frame's physical plan — the
    * metric bucketing exists to drive to zero (AQE-aware via
    * [[graft.std.Plans.collect]]).
    */
  def exchangeCount(df: DataFrame): Int =
    graft.std.Plans.collect(df) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
}
