package graft.std

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned equi-join (x19) — the row-level runtime-filter pattern
  * (Spark's own AQE bloom InSubqueryExec family, made explicit and
  * deterministic): build a fixed-size bloom filter over the build
  * side's join keys, filter the probe side BEFORE its shuffle, then
  * run the real join.
  *
  * Why at 100 TB: a selective join (dim slice × full fact) otherwise
  * shuffles the whole fact table only to drop most of it at the join.
  * The bloom cut happens scan-side — shuffle volume falls to (matching
  * rows + engineered false-positive rate × fact), while the broadcast
  * payload stays m/8 bytes NO MATTER how large the build side grows
  * (the d8→t30 lesson, applied to joins).
  *
  * The result is EXACT: the bloom has no false negatives by
  * construction, and false positives are dropped by the real join that
  * follows — which is why x19 oracle-gates against a plain SQL join.
  * NULL probe keys fail the (coalesced) membership probe and are
  * dropped, matching inner-join semantics exactly.
  */
object BloomJoin {

  /** The repo's shared non-negative 56-bit key hash ([[graft.functions.Md5Lane]]
    * lane 0 over the string form — the [[graft.functions.BloomBits]]
    * input contract).
    */
  private def keyHash(c: Column): Column =
    org.apache.spark.sql.GraftColumns.md5Lane(c.cast("string"), 0, 7)

  /** Inner equi-join of `probe` (large, would shuffle) against `build`
    * (the selective side), with the probe side bloom-pruned first.
    * Key columns must share a data type — the membership hash runs on
    * the string form, and a cross-type join whose equality relies on
    * numeric coercion (5 ≍ 5.0) would hash apart and silently drop
    * matches; the require makes that a loud error instead.
    *
    * Driver state: exactly m/8 bytes (the aggregated filter) — bounded
    * by construction, independent of either side's row count.
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
                      probeKey: String, buildKey: String,
                      m: Int = 1 << 20, kHashes: Int = 4): DataFrame = {
    val pt = probe.schema(probeKey).dataType
    val bt = build.schema(buildKey).dataType
    require(pt == bt,
      s"bloom join keys must share a type; got $probeKey: ${pt.simpleString}" +
        s" vs $buildKey: ${bt.simpleString}")
    val bloom = build.select(
        org.apache.spark.sql.GraftColumns
          .bloomAgg(keyHash(col(buildKey)), m, kHashes).as("_bloom"))
      .head().getAs[Array[Byte]](0)
    val pruned = probe.filter(coalesce(
      org.apache.spark.sql.GraftColumns.bloomContains(
        lit(bloom), keyHash(col(probeKey)), m, kHashes), lit(false)))
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}
