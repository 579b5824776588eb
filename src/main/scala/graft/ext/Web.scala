package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-curation primitives: URL → domain extraction, per-domain
  * analytics, and blocklist filtering — the provenance controls a
  * crawl-derived corpus applies before any content-based gate
  * (robots/opt-out lists, spam domains, license filters all arrive as
  * domain lists).
  *
  * URL shape: reuses [[TextAnalysis.UrlPattern]] (the t15/t34 scheme)
  * and lifts the host as the first `://`-to-delimiter run — identical
  * under Java regex and RE2, no backtracking constructs.
  */
object Web {

  /** Capture group 1 = host. `[^/ ]+` ends at the path slash or the
    * t15 token boundary (space).
    */
  val HostPattern = "https?://([^/ ]+)"

  /** Per-doc array of URL hosts (may repeat — one entry per URL). */
  def hostsOf(t: Column): Column =
    transform(regexp_extract_all(coalesce(t, lit("")),
      lit(TextAnalysis.UrlPattern), lit(0)),
      u => regexp_extract(u, HostPattern, 1))

  /** Per-domain analytics (t40): distinct-doc and URL-mention counts.
    * The corpus collapses to its extracted hosts BEFORE the shuffle —
    * shuffle volume is one (doc_id, host) pair per URL mention, never
    * text; the rollup is a partial-aggregated groupBy.
    */
  def domainStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val b = TextOps.attrBarrier(
      docs.select(col("doc_id"), col(textCol)), Seq("doc_id"),
      "_hosts", hostsOf(col(textCol)))
    b.select(col("doc_id"), explode(col("_hosts")).as("domain"))
      .groupBy(col("domain"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_urls"))
  }

  /** Blocklist filter (t41): docs that mention NO blocked domain
    * survive, with the verdict and evidence per doc. The blocklist is
    * a DataFrame (`domain` column — deduped defensively) BROADCAST to
    * a left join against the exploded host mentions; the verdict is
    * one groupBy over (doc_id, match-flag) mention rows — the only
    * shuffle, and it carries two tiny columns, never text. URL-less
    * docs survive via `explode_outer` (one null-domain mention each).
    */
  def blocklistFilter(docs: DataFrame, blocklist: DataFrame,
                      textCol: String = "text"): DataFrame = {
    val b = TextOps.attrBarrier(
      docs.select(col("doc_id"), col(textCol)), Seq("doc_id"),
      "_hosts", hostsOf(col(textCol)))
    val mentions = b.select(col("doc_id"),
      explode_outer(col("_hosts")).as("domain"))
    mentions
      .join(broadcast(blocklist.select(col("domain").as("_bl"))
        .distinct()), col("domain") === col("_bl"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(col("domain")).as("n_urls"),
        count(col("_bl")).as("n_blocked_urls"))
      .select(col("doc_id"), col("n_urls"), col("n_blocked_urls"),
        (col("n_blocked_urls") === 0).as("kept"))
  }
}
