package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared text primitives for the LLM-data-pipeline operators (dedup,
  * text analysis, fingerprinting). Everything here is a pure Catalyst
  * `Column` expression — per-row, no shuffle, whole-stage codegen.
  *
  * Determinism contract: every primitive has an exact DuckDB twin (see
  * [[graft.queries.ExtOracleSql]]). That rules out `xxhash64`/`hash`
  * (Spark-private seeds) — the cross-engine 64-bit hash is the first 56
  * bits of md5, which both engines compute identically. md5 is ~3× the
  * cost of xxhash64 in the hot path; for a production deployment swap
  * [[hash64]]'s body for `xxhash64` (the operators only need *a* stable
  * hash, the oracle needs a *shared* one).
  */
object TextOps {

  /** 56-bit non-negative hash from md5 — identical in DuckDB via
    * `CAST('0x' || substr(md5(s), 1, 14) AS BIGINT)`. Computed by the
    * native [[graft.functions.Md5Lane]] kernel (digest bytes 0-7
    * straight to a long); the builtin chain
    * `conv(substring(md5(c), 1, 14), 16, 10)` produces the same value
    * through three string allocations per hash — at shingle volume
    * that chain IS the corpus pipeline's hottest allocation site.
    */
  def hash64(c: Column): Column =
    org.apache.spark.sql.GraftColumns.md5Lane(c, 0, 7)

  /** Seed-prefixed hash — the "k independent permutations" of MinHash. */
  def hash64Seeded(seed: Int, c: Column): Column =
    hash64(concat(lit(s"$seed|"), c))

  /** Whitespace-collapsed, trimmed, lowercased text. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Word n-shingles (1-based slices of the token array); a document
    * shorter than `n` tokens contributes its whole text as one shingle.
    * Built by the native codegen kernel
    * ([[graft.functions.WordShingles]], r21 — the transform/concat_ws
    * HOF form ran interpreted per window); output strings are
    * byte-identical, so every downstream md5 signature is unchanged.
    * The isNull branch preserves the builtin chain's null behavior
    * (null token array → one empty shingle, the old otherwise-branch
    * outcome).
    */
  def shingles(toks: Column, n: Int): Column =
    when(toks.isNull, array(lit("")))
      .otherwise(org.apache.spark.sql.GraftColumns.wordShingles(toks, n))

  /** Sum of an array<long> via a sequential left fold (deterministic
    * summation order, unlike a shuffle aggregate).
    */
  def foldSumLong(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, v) => acc + v)

  /** Sequential left-fold sum of array<double> — deterministic float
    * summation order; the DuckDB twin (`list_aggregate(.., 'sum')`) folds
    * in the same element order.
    */
  def foldSumDouble(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** Generator barrier: `explode(array(e))` is a 1:1 Generate whose
    * output is a real ATTRIBUTE. Higher-order-function lambdas sit
    * outside codegen subexpression elimination, so a lambda that
    * captures a non-attribute column (e.g. `slice(toks, i, n)` where
    * `toks = split(regexp_replace(...))`) re-evaluates the whole
    * captured chain once PER ELEMENT — O(tokens²) string work per
    * document for shingling. Projections can't break this (CollapseProject
    * merges them back); a Generate can't be collapsed into, so anything
    * a downstream lambda captures should cross one of these first.
    * Null-safe: `array(e)` is never null, so a null `e` yields one row
    * with a null attribute — row counts are preserved, unlike a bare
    * `explode` of a nullable array.
    */
  def attrBarrier(df: org.apache.spark.sql.DataFrame, keep: Seq[String],
                  name: String, e: Column): org.apache.spark.sql.DataFrame =
    df.select(keep.map(col) :+ explode(array(e)).as(name): _*)

  /** Spread an UNDER-SPLIT scan across the configured shuffle
    * parallelism before a hash-heavy per-row kernel. The sf-test
    * parquet files are one row group — unsplittable below row-group
    * granularity, so `maxPartitionBytes` can't help and a narrow
    * pipeline over them runs as ONE task no matter the core count.
    * The explicit partition count keeps AQE from coalescing the (tiny)
    * exchange back to one partition.
    *
    * CONDITIONAL on the scan actually being under-split: a production
    * corpus arrives in thousands of splits, and there this is a no-op —
    * a pure per-row kernel must not pay a full-corpus shuffle it
    * doesn't need. Batch frames only (`rdd.getNumPartitions` is
    * undefined on a streaming frame).
    */
  def spreadByKey(df: org.apache.spark.sql.DataFrame,
                  key: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    val target =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= math.max(2, target / 2)) df
    else df.repartition(target, col(key))
  }
}
