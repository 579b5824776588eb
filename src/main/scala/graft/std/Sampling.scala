package graft.std

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement — Efraimidis–Spirakis A-RES:
  * each row draws a uniform `u` and survives if its key `u^(1/w)` is
  * among the top n. The training-data use is weighted corpus
  * subsampling (quality- or domain-weighted) where plain `TABLESAMPLE`
  * can't bias and per-group quotas (t21) are too coarse.
  *
  * Determinism (the repo's no-RNG rule): `u` derives from the shared
  * 56-bit md5 lane of the row id — (hash + 1) / 2^56 ∈ (0, 1] — so
  * the "random" draw is a pure function of the row, reproducible
  * across runs, partitionings, and engines. The selection key is
  * `ln(u)/w`, the monotone log transform of `u^(1/w)` (same top-n
  * set), because `ln` is the one transcendental whose cross-engine
  * agreement at 9 dp the oracle suite has already banked (t25/x16);
  * `pow` never enters. Ties at the 9-dp grain break on the row id.
  *
  * 100 TB shape: one scan computes keys row-locally; the top-n runs as
  * `TakeOrderedAndProject` (per-partition heads, n rows survive) —
  * no global sort, no shuffle of non-survivors. Weights must be
  * strictly positive; NULL or non-positive weights are rejected rows
  * (excluded with a documented filter, not silently keyed).
  */
object Sampling {

  /** Top-`n` weighted sample: returns the sampled rows' id, weight,
    * and the selection key (exposed so downstream audits can re-verify
    * the draw). Larger keys win — `ln(u)/w` is negative, and a larger
    * weight divides the negative log toward zero.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n >= 1, "need a positive sample size")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol), col(weightCol),
        esKey(col(idCol), col(weightCol)).as("sample_key"))
      .orderBy(col("sample_key").desc, col(idCol).asc)
      .limit(n)
  }

  /** The Efraimidis–Spirakis selection key `ln(u)/w` at 9 dp, with the
    * deterministic md5-lane uniform (see class doc). Spark's
    * BigDecimal-backed `round` yields `+0.0` for a tiny negative key —
    * no signed zero — so oracle twins must canonicalize theirs with
    * `+ 0.0` (DuckDB's float round keeps the sign bit).
    */
  private[graft] def esKey(id: Column, w: Column): Column = {
    val hv = org.apache.spark.sql.GraftColumns
      .md5Lane(id.cast("string"), 0, 7)
    val u = (hv + lit(1L)).cast("double") / lit(72057594037927936.0)
    round(log(u) / w.cast("double"), 9)
  }

  /** Per-group (stratified) top-`nPerGroup` weighted sample: the
    * [[weightedSample]] draw run independently within every value of
    * `groupCol` — per-domain or per-language quality-weighted corpus
    * subsampling, where a global draw would let one giant stratum
    * crowd out the rest.
    *
    * 100 TB shape: NOT a `row_number` window (which shuffles and sorts
    * the entire corpus by group) — the per-group top-n runs as the
    * native bounded aggregate [[graft.functions.TopSample]], so each
    * map task reduces its partition to ≤ groups × n survivors before
    * the exchange, and the shuffle carries survivors only. One
    * aggregation shuffle on `groupCol`, then a 1:n explode of the
    * winners.
    *
    * `idCol` must be long-castable and unique; null/non-positive
    * weights are rejected rows, as in [[weightedSample]].
    */
  def stratifiedWeightedSample(df: DataFrame, groupCol: String,
                               idCol: String, weightCol: String,
                               nPerGroup: Int): DataFrame = {
    require(nPerGroup >= 1, "need a positive per-group sample size")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(groupCol), col(idCol).cast("long").as("_id"),
        col(weightCol).cast("double").as("_w"),
        esKey(col(idCol), col(weightCol)).as("_k"))
      .groupBy(col(groupCol))
      .agg(org.apache.spark.sql.GraftColumns
        .topSample(col("_k"), col("_id"), col("_w"), nPerGroup).as("_top"))
      .select(col(groupCol), explode(col("_top")).as("_s"))
      .select(col(groupCol), col("_s.id").as(idCol),
        col("_s.payload").as(weightCol), col("_s.sample_key").as("sample_key"))
  }
}
