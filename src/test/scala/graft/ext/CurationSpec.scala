package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.Tables

/** The composed curation decision must agree with each standalone
  * operator it composes, and stay a one-scan / one-shuffle plan.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def corpus = ExtQueries.exactDupCorpus(
    ExtQueries.urlCorpus(Tables.documents(spark, sfDir)))
    // null text must curate like the empty doc, not crash or go null
    .unionByName(Seq(990001L).toDF("doc_id")
      .withColumn("text", lit(null).cast("string")))

  test("composed verdicts equal the standalone operators'") {
    val got = Curation.curate(corpus, ExtQueries.BlockedDomains)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getLong(3),
          r.getBoolean(4)))).toMap
    // keeper flag ≡ dropExactDuplicates survivors
    val survivors = Dedup.dropExactDuplicates(corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    got.foreach { case (id, (keeper, _, _, _)) =>
      assert(keeper == survivors.contains(id), s"keeper mismatch at $id")
    }
    // gopher flag ≡ gopherRules.passes
    val gopher = TextAnalysis.gopherRules(corpus).collect()
      .map(r => r.getLong(0) ->
        r.getBoolean(r.fieldIndex("passes"))).toMap
    got.foreach { case (id, (_, g, _, _)) =>
      assert(g == gopher(id), s"gopher mismatch at $id")
    }
    // blocked count ≡ Web.blocklistFilter's
    val blocked = Web.blocklistFilter(corpus,
      ExtQueries.BlockedDomains.toDF("domain")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, (_, _, nb, _)) =>
      assert(nb == blocked(id), s"blocked mismatch at $id")
    }
    // kept is exactly the conjunction
    got.foreach { case (id, (k, g, nb, kept)) =>
      assert(kept == (k && g && nb == 0), s"kept mismatch at $id")
    }
    assert(got.size == corpus.count())
  }

  test("the composed plan scans once and shuffles once (the window)") {
    val frame = Curation.curate(corpus, ExtQueries.BlockedDomains)
    frame.collect()
    val shuffles = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length
    assert(shuffles == 1, s"expected only the dedup window, saw $shuffles")
  }
}
