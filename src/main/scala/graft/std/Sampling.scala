package graft.std

import org.apache.spark.sql.DataFrame
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
    val hv = org.apache.spark.sql.GraftColumns
      .md5Lane(col(idCol).cast("string"), 0, 7)
    val u = (hv + lit(1L)).cast("double") / lit(72057594037927936.0)
    val key = round(log(u) / col(weightCol).cast("double"), 9)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol), col(weightCol), key.as("sample_key"))
      .orderBy(col("sample_key").desc, col(idCol).asc)
      .limit(n)
  }
}
