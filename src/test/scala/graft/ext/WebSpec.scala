package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** URL → domain extraction and blocklist filtering. */
class WebSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "see https://a.example/x and http://b.example/y plus http://a.example/z"),
    (2L, "only http://b.example here"),
    (3L, "no urls at all"),
    (4L, null.asInstanceOf[String])).toDF("doc_id", "text")

  test("domain stats count docs and mentions per extracted host") {
    val out = Web.domainStats(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // a.example: 2 mentions in one doc; b.example: 2 docs, 2 mentions
    assert(out == Map(
      "a.example" -> ((1L, 2L)),
      "b.example" -> ((2L, 2L))))
  }

  test("blocklist filter keeps URL-less docs and counts blocked mentions") {
    val bl = Seq("a.example", "a.example").toDF("domain") // dupes deduped
    val out = Web.blocklistFilter(docs, bl).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((3L, 2L, false))) // both a.example mentions hit
    assert(out(2L) == ((1L, 0L, true)))
    assert(out(3L) == ((0L, 0L, true))) // no URLs: survives
    assert(out(4L) == ((0L, 0L, true))) // null text: survives
    assert(out.size == 4)               // every doc gets a verdict
  }

  test("canonical URL: each rule fires and path case survives") {
    val cases = Seq(
      // fragment + tracking + trailing slash + host case + default port
      (1L, "https://WWW.Ex.COM:443/A/B/?utm_source=f&utm_campaign=x#top"),
      (2L, "https://www.ex.com/A/B"),          // already canonical
      (3L, "http://h.ex:80/p?ref=1&utm_medium=m"), // keep ref, drop utm
      (4L, "http://h.ex:8080/p"),              // NON-default port survives
      (5L, "https://a.ex/?utm_a=1&utm_b=2"),   // all params drop, ? tidied
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "url")
    val out = cases.select(col("doc_id"),
        Web.canonicalUrl(col("url")).as("c")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(out(1L) == "https://www.ex.com/A/B")  // path case PRESERVED
    assert(out(2L) == "https://www.ex.com/A/B")
    assert(out(3L) == "http://h.ex/p?ref=1")
    assert(out(4L) == "http://h.ex:8080/p")
    assert(out(5L) == "https://a.ex")
    assert(out(6L) == null)
  }

  test("canonicalization is idempotent over varied url shapes") {
    // a canonicalizer that keeps normalizing on re-application would
    // give different dedup keys depending on how many times a pipeline
    // stage happened to run — fixpoint after one pass is the contract
    val shapes = (for {
      host <- Seq("A.Ex", "a.ex", "WWW.B.Ex")
      port <- Seq("", ":443", ":8080")
      path <- Seq("", "/", "/P/q", "/P/q/")
      query <- Seq("", "?utm_a=1", "?r=2&utm_b=x&s=3", "?utm_a=1&utm_b=2")
      frag <- Seq("", "#f")
    } yield s"https://$host$port$path$query$frag").zipWithIndex
      .map { case (u, i) => (i.toLong, u) }
    val df = shapes.toDF("id", "url")
    val once = Web.canonicalUrl(col("url"))
    val twice = Web.canonicalUrl(once)
    val diffs = df.select(col("url"), once.as("c1"), twice.as("c2"))
      .filter(col("c1") =!= col("c2")).collect()
    assert(diffs.isEmpty,
      s"not idempotent for: ${diffs.map(_.getString(0)).mkString(", ")}")
  }

  test("url dedup: min doc_id survives per canonical class") {
    val docs = Seq(
      (10L, "https://A.ex/x/"),
      (3L, "https://a.ex/x?utm_source=s"),
      (7L, "https://a.ex/y"))
      .toDF("doc_id", "url")
    val out = Web.urlDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(3)))).toMap
    assert(out(3L) == (("https://a.ex/x", true)))   // min of {3, 10}
    assert(out(10L) == (("https://a.ex/x", false)))
    assert(out(7L) == (("https://a.ex/y", true)))
  }

  test("blocklist join broadcasts; verdict shuffle carries no text") {
    val bl = Seq("a.example").toDF("domain")
    val frame = Web.blocklistFilter(docs, bl)
    frame.collect()
    val bcasts = graft.std.Plans.collect(frame) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.length
    assert(bcasts == 1, s"expected the blocklist broadcast, saw $bcasts")
  }
}
