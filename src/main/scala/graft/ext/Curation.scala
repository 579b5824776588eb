package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end curation DECISION — the whole library composed into
  * one query: exact-dedup keeper selection, the Gopher quality gate,
  * and the domain blocklist, each contributing a per-doc verdict
  * column and conjoined into `kept`. The audit shape every curation
  * run publishes: not just the surviving set, but WHY each document
  * lived or died.
  *
  * 100-TB shape: ONE corpus scan. The only shuffle is the dedup
  * window (partitioned by content digest — 16-byte keys, never text);
  * every gate below it is a per-row expression over one barriered
  * token attribute, and the blocklist rides along as an `isin` over
  * the extracted hosts (the list ships in the plan — right for
  * list-sized blocklists; a 100k-entry list switches to
  * [[Web.blocklistFilter]]'s broadcast-join form, same verdicts).
  */
object Curation {

  def curate(docs: DataFrame, blockedDomains: Seq[String],
             textCol: String = "text"): DataFrame = {
    // null text curates like the empty document (the t28 rule) — the
    // coalesce happens once, so the digest, gates and hosts all read
    // the same non-null attribute
    val digest = md5(TextOps.normText(col(textCol)))
    val w = Window.partitionBy(digest).orderBy(col("doc_id"))
    val withKeeper = docs.select(col("doc_id"),
      coalesce(col(textCol), lit("")).as(textCol))
      .withColumn("is_keeper", row_number().over(w) === 1)
    val b = TextOps.attrBarrier(withKeeper,
      Seq("doc_id", textCol, "is_keeper"),
      "_toks", TextOps.tokens(col(textCol)))
    val b2 = TextOps.attrBarrier(b,
      Seq("doc_id", textCol, "is_keeper", "_toks"),
      "_hosts", Web.hostsOf(col(textCol)))
    val nBlocked = size(filter(col("_hosts"),
      h => h.isin(blockedDomains.map(d => d: Any): _*))).cast("long")
    b2.select(
      col("doc_id"),
      col("is_keeper"),
      TextAnalysis.gopherPasses(col("_toks"), col(textCol))
        .as("passes_gopher"),
      nBlocked.as("n_blocked_urls"))
      .withColumn("kept",
        col("is_keeper") && col("passes_gopher") &&
          col("n_blocked_urls") === 0)
  }
}
