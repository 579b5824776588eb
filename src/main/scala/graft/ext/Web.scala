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

  /** Canonical URL form (t45) — the normalization a crawl pipeline
    * applies before URL-keyed dedup, where raw-string identity would
    * miss most duplicates (CCNet/RefinedWeb both dedup fetch lists this
    * way). Rules, in order:
    *
    *   1. drop the fragment (`#...` — client-side only);
    *   2. lowercase the scheme+host prefix (case-insensitive by RFC
    *      3986; the PATH stays case-sensitive and untouched);
    *   3. drop an explicit default port (`https://h:443`, `http://h:80`);
    *   4. drop tracking query params (`utm_*`, `fbclid`, `gclid`) and
    *      tidy the orphaned `?`/`&`;
    *   5. drop a trailing slash.
    *
    * Every rule is a `lower`/`regexp_extract`/`regexp_replace` over
    * RE2-safe patterns (no backtracking constructs), so the identical
    * chain runs under Java regex and the oracle's RE2 — byte-equal
    * outputs, which is what lets the canonical string BE the dedup key
    * cross-engine. NULL propagates.
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val prefix = regexp_extract(noFrag, "^(https?://[^/?#]*)", 1)
    val rest = noFrag.substr(length(prefix) + 1, lit(1000000))
    val hostLower = lower(prefix)
    val noPort = regexp_replace(
      regexp_replace(hostLower, "^(https://[^:/]*):443$", "$1"),
      "^(http://[^:/]*):80$", "$1")
    val noTrack = regexp_replace(concat(noPort, rest),
      "(utm_[a-z]+|fbclid|gclid)=[^&#]*&?", "")
    regexp_replace(regexp_replace(noTrack, "[?&]$", ""), "/$", "")
  }

  /** URL-keyed dedup (t45): per document, its canonical URL and the
    * keep verdict — the group's minimum doc_id survives (first-fetch-
    * wins; the d6 keeper rule on the URL key instead of content).
    *
    * 100 TB shape: ONE shuffle on the canonical string over a skinny
    * (doc_id, url) projection — text never moves; the per-group min
    * runs as a window on that key (equivalently a groupBy + join-back,
    * but one pass). Canonicalization itself is a per-row codegen
    * expression chain, zero extra passes.
    */
  def urlDedup(docs: DataFrame, urlCol: String = "url"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("canonical_url"))
    docs.select(col("doc_id"), col(urlCol),
        canonicalUrl(col(urlCol)).as("canonical_url"))
      .withColumn("keep",
        col("doc_id") === min(col("doc_id")).over(w))
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
